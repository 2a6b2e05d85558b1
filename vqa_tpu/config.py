"""CLI / config system with the reference's exact flag surface.

Port of `/root/reference/main.py:21-107`: the same ~34 argparse flags with the
same names, defaults, and help strings' semantics; per-experiment persistence
as ``param.pkl`` (dict pickle) + human-readable ``param.txt``; reload via
``--load_setting`` (class ``Argument``, main.py:21-37 — without the reference's
path double-join bug, SURVEY.md section 2.1 defect 6).

Device flags (``--device``/``--decoder_device``) are accepted for CLI
compatibility but are no-ops: device selection is JAX's, and multi-device
placement is mesh sharding (see vqa_tpu/parallel/).
"""

from __future__ import annotations

import argparse
import os
import pickle


class Argument:
    """Reload a saved experiment config (reference main.py:21-37)."""

    def __init__(self, load_dir: str):
        with open(os.path.join(load_dir, "param.pkl"), "rb") as f:
            inputs = pickle.load(f)
        for key, value in inputs.items():
            setattr(self, key, value)

    def __repr__(self):
        return "".join(f"{k}: {v}\n" for k, v in self.__dict__.items())

    def save(self, save_dir: str):
        with open(os.path.join(save_dir, "param.pkl"), "wb") as f:
            pickle.dump(self.__dict__, f)


def save_args(args, save_dir: str) -> None:
    """Persist param.pkl + param.txt (reference main.py:128-135)."""
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "param.pkl"), "wb") as f:
        pickle.dump(args.__dict__, f)
    with open(os.path.join(save_dir, "param.txt"), "w") as f:
        for key, value in args.__dict__.items():
            f.write(f"{key}: {value}\n")


def parse_args(argv=None):
    """The reference CLI (main.py:40-107), flag for flag."""
    parser = argparse.ArgumentParser()

    # save settings
    parser.add_argument("--comment", type=str, default="exp1")
    parser.add_argument("--load_setting", type=bool, default=False)
    parser.add_argument("--device", type=str, default="",
                        help="accepted for parity; JAX selects devices")
    parser.add_argument("--seed", type=int, default=1111)

    # path settings
    parser.add_argument("--vocab_path", type=str, default="../data/vocab_list.txt")
    parser.add_argument("--ans_path", type=str, default="../data/answer_candidate.txt")
    parser.add_argument("--load_path", type=str, default="../annot")
    parser.add_argument("--feature_path", type=str, default="../../COCO_feature_36")
    parser.add_argument("--select_path", type=str,
                        default="../annot/select_caption/most_relevant.pkl")
    parser.add_argument("--graph_path", type=str, default="../../COCO_graph_36")
    parser.add_argument("--index_path", type=str, default="index.json",
                        help="answer-type index (canonical JSON; the reference "
                             "mixed pkl/json, SURVEY.md 2.1 #10)")

    # dataset and dataloader settings
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--shuffle", type=bool, default=True)
    parser.add_argument("--c_len", type=int, default=20)

    # encoder settings
    parser.add_argument("--encoder_type", type=str, default="base")
    parser.add_argument("--rnn_type", type=str, default="GRU")
    parser.add_argument("--att_type", type=str, default="new")
    parser.add_argument("--embed_dim", type=int, default=300)
    parser.add_argument("--hidden_dim", type=int, default=1024)
    parser.add_argument("--v_dim", type=int, default=2048)
    parser.add_argument("--dropout", type=float, default=0.2)
    parser.add_argument("--rnn_layer", type=int, default=1)

    # predictor settings
    parser.add_argument("--predictor_type", type=str, default="base")
    parser.add_argument("--cls_layer", type=int, default=2)

    # relation encoder settings
    parser.add_argument("--conv_type", type=str, default="corr")
    parser.add_argument("--conv_layer", type=int, default=1)
    # Relation-branch toggles: the reference defines use_imp/use_spa/use_sem
    # on RelationEncoder (encoder.py:202-208) but never exposes them through
    # the CLI/factory; full ReGAT = spatial + implicit, so the rebuild does
    # (int 0/1: argparse type=bool is a truthiness trap on strings).
    parser.add_argument("--use_spa", type=int, default=1,
                        help="relation encoder: spatial-relation GCN branch")
    parser.add_argument("--use_imp", type=int, default=0,
                        help="relation encoder: implicit (fully-connected) branch")
    parser.add_argument("--use_sem", type=int, default=0,
                        help="relation encoder: semantic branch (graph via "
                             "batch['sem_graph'])")

    # pre-trained word embedding
    parser.add_argument("--pretrained_embed_path", type=str,
                        default="../data/glove.6B/glove.6B.300d.txt")

    # decoder settings
    parser.add_argument("--decoder_type", type=str, default="base")
    parser.add_argument("--decoder_hidden_dim", type=int, default=512)
    parser.add_argument("--decoder_device", type=str, default="",
                        help="accepted for parity; superseded by mesh sharding")

    # learning rate scheduler settings
    parser.add_argument("--lr", type=float, default=0.002)
    parser.add_argument("--lr_vqa", type=float, default=0)
    parser.add_argument("--lr_cap", type=float, default=0)
    parser.add_argument("--warm_up", type=int, default=0)
    parser.add_argument("--step_size", type=int, default=0)
    parser.add_argument("--gamma", type=float, default=0.5)
    parser.add_argument("--use_mtl", type=bool, default=True)

    # training/validating process settings
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument("--load_model", type=str, default="")
    parser.add_argument("--epoches", type=int, default=15)
    parser.add_argument("--batches", type=int, default=0)
    parser.add_argument("--start_epoch", type=int, default=0)

    # TPU-native additions (absent in the reference)
    parser.add_argument("--n_model_shards", type=int, default=1,
                        help="tensor-parallel axis size of the device mesh")
    parser.add_argument("--train_strategy", type=str, default="joint",
                        help="joint | select (Q-Relevant max-relevance "
                             "backprop; the reference stubbed this out)")
    parser.add_argument("--profile_dir", type=str, default="",
                        help="capture a jax.profiler trace of a few steps")
    # (int 0/1, not type=bool: bool('0') is True — the truthiness trap)
    parser.add_argument("--use_pallas", type=int, default=0,
                        help="route eligible ops through fused Pallas kernels "
                             "(bf16 inference fast path; in MTL caption "
                             "training, the fused decode-attention kernels — "
                             "the attention-dropout mask comes from the "
                             "in-kernel hardware PRNG, a different stream "
                             "than the XLA path at the same keep law)")
    parser.add_argument("--approx_topk", type=int, default=0,
                        help="decode mode: use the TPU PartialReduce custom "
                             "call (lax.approx_max_k, recall 0.99) for the "
                             "beam's per-step vocab top-k — APPROXIMATE "
                             "serving trade (~1% of per-row top-k entries "
                             "may swap with near-rank neighbors); no-op "
                             "with --use_pallas (fused head stays exact)")
    parser.add_argument("--use_int8", type=int, default=0,
                        help="int8 MXU GEMMs at inference (training always "
                             "differentiates the f32 path): the attention "
                             "v-projection consumes the quantized feed "
                             "directly when the batch ships img_q "
                             "(--feature_dtype int8; no-op on dense feeds), "
                             "and ReGAT's GCN projections dynamically "
                             "row-quantize their layer input (any feed)")
    parser.add_argument("--feature_dtype", type=str, default="float32",
                        help="dtype of visual features on device")
    parser.add_argument("--decode_dtype", type=str, default="float32",
                        help="beam-decode compute dtype (float32 | "
                             "bfloat16); bfloat16 halves decode time "
                             "(PERF.md 'Beam decode') — opt-in because "
                             "rare near-tie token picks can differ from "
                             "the f32 reference decode")
    parser.add_argument("--train_dtype", type=str, default="bfloat16",
                        help="matmul compute dtype for training "
                             "(float32 | bfloat16); master params and "
                             "optimizer moments stay f32 (mixed precision). "
                             "Default bfloat16: the mini-split convergence "
                             "study (PERF.md 'bf16 training') shows loss "
                             "trajectories tracking f32 within 0.1%% rel "
                             "while the MXU runs ~2x faster; pass "
                             "--train_dtype float32 for bit-exact "
                             "reference-recipe numerics")
    parser.add_argument("--length_bucket", type=int, default=0,
                        help="bucket training batches by caption length and "
                             "truncate the caption axis to the bucket bound "
                             "(8/10/12/14/16/c_len): the decoder scan skips "
                             "all-masked steps — identical loss per sample, "
                             "~1.5x caption-training throughput at real "
                             "caption lengths. Batch composition diverges "
                             "from the reference's uniform shuffle, and "
                             "caption-reading heads (base-cap/q-cap) no "
                             "longer see the padded-tail RNN noise "
                             "(PARITY.md 'Length bucketing'); single-host "
                             "only")
    parser.add_argument("--bucket_bounds", type=str, default="8,10,12,14,16",
                        help="comma-separated --length_bucket bounds; c_len "
                             "is always appended as the last bucket. More "
                             "bounds = shorter padded tails (each bound "
                             "compiles its own step once); e.g. add 18 to "
                             "shave the rare >=17-token bucket")
    parser.add_argument("--prng_impl", type=str, default="rbg",
                        help="dropout PRNG implementation (rbg | "
                             "threefry2x32). Default rbg: XLA's hardware "
                             "RngBitGenerator — threefry mask generation "
                             "dominated the caption-decoder train step on "
                             "TPU (PERF.md 'MTL train step'). Pass "
                             "threefry2x32 to reproduce dropout streams "
                             "from runs before this flag existed; both are "
                             "valid dropout, only the random stream differs")
    parser.add_argument("--val_every", type=int, default=0,
                        help="validate every N batches mid-epoch (0 keeps the "
                             "reference's samples-modulus quirk, train.py:121)")

    return parser.parse_args(argv)


def dataset_type_from_args(args) -> str:
    """select_path sentinel mapping (reference main.py:162-164)."""
    if args.select_path == "vqa-e":
        return "vqa-e"
    if args.select_path == "none":
        return "all"
    if args.select_path == "vqa":
        return "vqa"  # TPU-native addition: plain VQA dataset is selectable
    return "select"
