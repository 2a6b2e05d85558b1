"""Attention visualization: draw the top-k attended boxes on the image.

Port of `/root/reference/tools/visualize.py`: crop/paste the top-k attended
regions with alpha dimming, rectangle + score overlays; graph-attention view
via the relation encoder's correlation alphas. PIL-based, host-side (off the
hot path).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

try:
    from PIL import Image, ImageDraw, ImageFont
    HAS_PIL = True
except ImportError:  # headless minimal envs
    HAS_PIL = False


def sample_one_batch(dataset, sample: int = 0) -> dict:
    """One example as a batch-of-1 with host metadata (visualize.py:7-24)."""
    batch = {k: v[None] for k, v in dataset[sample].items()}
    meta = {
        "feature": dataset.questions[sample]["img_file"],
        "q_word": dataset.questions[sample].get("q_word", ""),
        "target": dataset.answers[sample],
    }
    if hasattr(dataset, "captions") and hasattr(dataset, "caption_id"):
        img_id = str(int(meta["feature"][-16:-4]))
        meta["c_word"] = dataset.captions[img_id]["c_word"][
            dataset.caption_id[sample]]
    return {**batch, "_meta": meta}


# dimming levels: everything outside the top-k fades to BACKDROP_ALPHA;
# top-k boxes other than the argmax fade to RUNNERUP_ALPHA
BACKDROP_ALPHA = 30
RUNNERUP_ALPHA = 128
TOP_COLOR = "red"          # argmax box
OTHER_COLOR = "lightcoral"  # remaining top-k boxes


def _label_box(draw, xy, text, color, font):
    """Rectangle outline + a filled score tag in its top-left corner."""
    x0, y0, x1, y1 = xy
    draw.rectangle([(x0, y0), (x1, y1)], outline=color, width=2)
    l, t, r, b = draw.textbbox((0, 0), text, font=font)
    draw.rectangle([(x0, y0), (x0 + (r - l) + 1, y0 + (b - t) + 1)], fill=color)
    draw.text([x0, y0], text)


def show_att(att: np.ndarray, img, bbox: np.ndarray, k: int = 3,
             output=None):
    """Render an attention map over the image's boxes.

    The whole image is dimmed, the k highest-attention boxes are pasted back
    (argmax fully opaque, the rest half-faded) and outlined with their
    attention scores. Same artifact as the reference tool
    (`/root/reference/tools/visualize.py:27-59`), reimplemented on numpy
    ranking + PIL compositing.
    """
    assert HAS_PIL, "PIL required for visualization"
    att = np.asarray(att).reshape(-1)
    # top-k box indices, strongest first
    ranked = np.argsort(-att)[:k]

    if output is None:
        output = img.copy()
        output.putalpha(BACKDROP_ALPHA)

    # paste weakest -> strongest so stronger boxes win overlaps
    for box_id in reversed(ranked):
        x0, y0, x1, y1 = bbox[box_id][:4]
        region = img.crop([x0, y0, x1, y1])
        if att[box_id] < att[ranked[0]]:
            region.putalpha(RUNNERUP_ALPHA)
        output.paste(region, (int(x0), int(y0)))

    draw = ImageDraw.Draw(output)
    font = ImageFont.load_default()
    for rank, box_id in enumerate(ranked):
        color = TOP_COLOR if rank == 0 else OTHER_COLOR
        _label_box(draw, bbox[box_id][:4], f"{att[box_id]:.2f}", color, font)
    return output


def print_result(meta: dict, predict: np.ndarray, ans_list: List[str]):
    print("Q:", meta.get("q_word", ""))
    if "c_word" in meta:
        print("C:", meta["c_word"])
    print("target:")
    for i, j in meta["target"].items():
        print(f"{min(j, 3) / 3:.2f}", ans_list[int(i)])
    print("\npredict: ", ans_list[int(np.argmax(predict))])


def show_top_k_regions(model, params, dataset, ans_list, sample: int = 0,
                       img_path: str = "../COCO", k: int = 3):
    """Top-k attended regions for one sample (visualize.py:97-118)."""
    batch = sample_one_batch(dataset, sample)
    meta = batch.pop("_meta")
    predict, att = model.apply({"params": params}, batch, method="get_att")
    att = np.asarray(att)[0].reshape(-1)

    img_file = meta["feature"][:-3] + "jpg"
    img = Image.open(os.path.join(
        img_path, os.path.basename(dataset.backend.feature_dir), img_file))
    bbox = np.load(os.path.join(dataset.backend.feature_dir,
                                meta["feature"]))["bbox"]
    output = show_att(att, img, bbox, k=k)
    print_result(meta, np.asarray(predict)[0], ans_list)
    return output


def show_graph_att(model, params, dataset, ans_list, sample: int = 0,
                   img_path: str = "../COCO", k: int = 3, layer: int = -1):
    """Correlation-alpha view of the relation encoder (visualize.py:71-94)."""
    batch = sample_one_batch(dataset, sample)
    meta = batch.pop("_meta")
    predict, att = model.apply({"params": params}, batch, method="get_att")
    index = int(np.argmax(np.asarray(att)[0]))

    def enc_alpha(mdl, b):
        return mdl.encoder(b, graph_alpha=True)
    alphas = model.apply({"params": params}, batch, method=enc_alpha)
    g_att = np.asarray(alphas[layer])[0, index, :].copy()
    g_att[index] = 1.0

    img_file = meta["feature"][:-3] + "jpg"
    img = Image.open(os.path.join(
        img_path, os.path.basename(dataset.backend.feature_dir), img_file))
    bbox = np.load(os.path.join(dataset.backend.feature_dir,
                                meta["feature"]))["bbox"]
    output = show_att(g_att, img, bbox, k=k + 1)
    print_result(meta, np.asarray(predict)[0], ans_list)
    return output
