"""End-to-end CLI smoke tests: main.py train/val/decode + cap_eval.py.

Runs the real entry points as subprocesses on the synthetic mini-split
(CPU), exercising the full surface: config persistence, training loop,
checkpointing, evaluation with answer-type breakdown, beam-search decode,
and caption metric scoring.
"""

import json
import os
import subprocess
import sys

import pytest

from vqa_tpu.data.synthetic import make_synthetic_root

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli")
    root = make_synthetic_root(str(path), num_images=6, num_questions=24)
    make_synthetic_root(str(path), split="val2014", num_images=4,
                        num_questions=12, seed=9)
    return path, root


def run_cli(script, args, cwd):
    env = dict(os.environ)
    env["VQA_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args,
        cwd=str(cwd), env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    return proc


def common_args(root, extra):
    return [
        "--vocab_path", root["vocab_path"],
        "--ans_path", root["ans_path"],
        "--load_path", root["annot"],
        "--feature_path", root["feature_root"],
        "--select_path", root["select_path"],
        "--pretrained_embed_path", "",
        "--embed_dim", "16", "--hidden_dim", "24",
        "--decoder_hidden_dim", "20", "--v_dim", str(root["v_dim"]),
        "--batch_size", "8", "--epoches", "1",
    ] + extra


def test_train_and_val_vqa(workdir):
    path, root = workdir
    proc = run_cli("main.py", common_args(root, [
        "--mode", "train", "--comment", "cli_vqa",
        "--predictor_type", "base", "--decoder_type", "none",
        "--select_path", "vqa",
    ]), cwd=path)
    ckpt = path / "checkpoint" / "cli_vqa"
    assert (ckpt / "param.pkl").exists()
    assert (ckpt / "param.txt").exists()
    assert (ckpt / "epoch_0.ckpt").exists()
    assert (ckpt / "best_model.ckpt").exists()
    assert (ckpt / "valid" / "scores.npy").exists()
    assert "hparam/score" in proc.stdout

    # standalone val mode reloads the best model
    proc = run_cli("main.py", common_args(root, [
        "--mode", "val", "--comment", "cli_vqa",
        "--predictor_type", "base", "--decoder_type", "none",
        "--select_path", "vqa",
    ]), cwd=path)
    assert "hparam/yes/no" in proc.stdout


def test_train_decode_and_cap_eval(workdir):
    path, root = workdir
    run_cli("main.py", common_args(root, [
        "--mode", "train", "--comment", "cli_cap",
        "--predictor_type", "base-cap", "--decoder_type", "base",
        "--c_len", str(root["c_len"]),
    ]), cwd=path)
    run_cli("main.py", common_args(root, [
        "--mode", "decode", "--comment", "cli_cap",
        "--predictor_type", "base-cap", "--decoder_type", "base",
        "--c_len", str(root["c_len"]),
        "--decode_dtype", "bfloat16",   # the fast decode recipe (PERF.md)
    ]), cwd=path)
    decode = path / "checkpoint" / "cli_cap" / "decode.txt"
    assert decode.exists()
    lines = [l for l in decode.read_text().split("\n") if l]
    assert len(lines) == 12  # one caption per val question

    proc = run_cli("cap_eval.py", [
        "--load_path", "cli_cap",
        "--load_ref", os.path.join(root["annot"], "val2014_captions.json"),
    ], cwd=path)
    result = path / "checkpoint" / "cli_cap" / "eval_result.txt"
    assert result.exists()
    text = result.read_text()
    for metric in ("Bleu_1", "METEOR", "CIDEr", "ROUGE_L"):
        assert metric in text


def test_caption_only_train_decode(workdir):
    """CONFIGS.md config 2 verbatim shape: --predictor_type none trains
    (best_model.ckpt tracked by lowest train caption loss — the reference
    never saves one here and its decode crashes, main.py:298-302), decodes
    without --load_model, and cap_eval scores the output."""
    path, root = workdir
    base = common_args(root, [
        "--comment", "cli_cap_only",
        "--predictor_type", "none", "--decoder_type", "butd",
        "--c_len", str(root["c_len"]),
    ])
    run_cli("main.py", base + ["--mode", "train"], cwd=path)
    ckpt = path / "checkpoint" / "cli_cap_only"
    assert (ckpt / "best_model.ckpt").exists()
    run_cli("main.py", base + ["--mode", "decode"], cwd=path)
    decode = ckpt / "decode.txt"
    lines = [l for l in decode.read_text().split("\n") if l]
    assert len(lines) == 12
    run_cli("cap_eval.py", [
        "--load_path", "cli_cap_only",
        "--load_ref", os.path.join(root["annot"], "val2014_captions.json"),
    ], cwd=path)
    assert (ckpt / "eval_result.txt").exists()


def test_preprocessing_cli(workdir, tmp_path):
    """preprocessing.py over synthetic raw VQA/COCO JSON."""
    path, root = workdir
    raw = tmp_path / "raw"
    (raw / "vqa").mkdir(parents=True)
    (raw / "coco").mkdir()
    annotations = {"annotations": [
        {"image_id": 1, "answer_type": "yes/no",
         "answers": [{"answer": "a1"}] * 4 + [{"answer": "a2"}]},
        {"image_id": 2, "answer_type": "other",
         "answers": [{"answer": "a0"}] * 10},
    ]}
    questions = {"questions": [
        {"image_id": 1, "question": "Is the dog's toy red?"},
        {"image_id": 2, "question": "What color is it?"},
    ]}
    captions = {"annotations": [
        {"image_id": 1, "caption": "A dog plays."},
        {"image_id": 1, "caption": "Red toy, happy dog."},
        {"image_id": 2, "caption": "A colorful scene."},
    ]}
    for name, data in [("v2_mscoco_train2014_annotations.json", annotations),
                       ("v2_OpenEnded_mscoco_train2014_questions.json",
                        questions)]:
        with open(raw / "vqa" / name, "w") as f:
            json.dump(data, f)
    with open(raw / "coco" / "captions_train2014.json", "w") as f:
        json.dump(captions, f)

    out = tmp_path / "annot"
    run_cli("preprocessing.py", [
        "--vqa_path", str(raw / "vqa"),
        "--coco_path", str(raw / "coco"),
        "--vocab_path", root["vocab_path"],
        "--ans_vocab_path", root["ans_path"],
        "--dataset_type", "train2014",
        "--save_path", str(out),
        "--save_q", "1", "--save_a", "1", "--save_c", "1",
    ], cwd=tmp_path)

    with open(out / "train2014_questions.json") as f:
        q = json.load(f)["data"]
    assert len(q) == 2
    assert len(q[0]["q"]) == 10
    assert q[0]["img_file"] == "COCO_train2014_000000000001.npz"
    with open(out / "train2014_answers.json") as f:
        a = json.load(f)["data"]
    assert a[0] == {"1": 4, "2": 1}
    with open(out / "index.json") as f:
        idx = json.load(f)
    assert idx["yes/no"] == [0] and idx["other"] == [1]
    with open(out / "train2014_captions.json") as f:
        c = json.load(f)["data"]
    assert set(c.keys()) == {"1", "2"}
    assert c["1"]["c_word"][0].startswith("<start> ")
    assert len(c["1"]["c"][0]) == 20


def test_gate_check_script(workdir, tmp_path):
    """scripts/gate_check.py parses the val hparams record and applies the
    55.8 gate (RUNBOOK.md). Uses the scalars.jsonl written by the cli_vqa
    val run plus a synthetic passing record."""
    path, root = workdir
    exp = path / "checkpoint" / "cli_vqa"
    assert (exp / "scalars.jsonl").exists()  # test_train_and_val_vqa ran
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gate_check.py"),
         str(exp), "--threshold", "55.8"],
        capture_output=True, text=True)
    assert proc.returncode == 1  # synthetic mini-split is far below gate
    assert "FAIL" in proc.stdout
    good = tmp_path / "good"
    good.mkdir()
    (good / "scalars.jsonl").write_text(json.dumps(
        {"hparams": {}, "metrics": {"hparam/score": 0.5623,
                                    "hparam/yes/no": 0.77}}) + "\n")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gate_check.py"),
         str(good), "--threshold", "55.8"],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout


def test_train_select_strategy(workdir):
    """Q-Relevant max-relevance training via the CLI."""
    path, root = workdir
    proc = run_cli("main.py", common_args(root, [
        "--mode", "train", "--comment", "cli_select",
        "--predictor_type", "base-cap", "--decoder_type", "base",
        "--train_strategy", "select",
        "--c_len", str(root["c_len"]),
    ]), cwd=path)
    ckpt = path / "checkpoint" / "cli_select"
    assert (ckpt / "epoch_0.ckpt").exists()
    assert (ckpt / "best_model.ckpt").exists()


def test_train_relation_encoder(workdir):
    """Full ReGAT: spatial + implicit relation branches via the CLI
    (--use_imp exposes what the reference hides, encoder.py:202-234)."""
    path, root = workdir
    run_cli("main.py", common_args(root, [
        "--mode", "train", "--comment", "cli_regat",
        "--encoder_type", "relation", "--conv_type", "corr",
        "--conv_layer", "1",
        "--use_spa", "1", "--use_imp", "1",
        "--predictor_type", "base", "--decoder_type", "none",
        "--select_path", "vqa",
        "--graph_path", root["graph_root"],
    ]), cwd=path)
    ckpt = path / "checkpoint" / "cli_regat"
    assert (ckpt / "best_model.ckpt").exists()


def test_resume_from_checkpoint(workdir):
    """--start_epoch resume restores the full train state (main.py parity)."""
    path, root = workdir
    args = common_args(root, [
        "--mode", "train", "--comment", "cli_resume",
        "--predictor_type", "base", "--decoder_type", "none",
        "--select_path", "vqa",
    ])
    run_cli("main.py", args, cwd=path)
    # continue for a second epoch from the saved state
    run_cli("main.py", args + ["--start_epoch", "1", "--epoches", "2"],
            cwd=path)
    ckpt = path / "checkpoint" / "cli_resume"
    assert (ckpt / "epoch_0.ckpt").exists()
    assert (ckpt / "epoch_1.ckpt").exists()


def test_tpu_flags_smoke(workdir):
    """--use_pallas / --feature_dtype / --n_model_shards plumb through train."""
    path, root = workdir
    run_cli("main.py", common_args(root, [
        "--mode", "train", "--comment", "cli_flags",
        "--predictor_type", "base", "--decoder_type", "none",
        "--select_path", "vqa",
        "--use_pallas", "1", "--feature_dtype", "float16",
        "--batches", "2",
    ]), cwd=path)
    assert (path / "checkpoint" / "cli_flags" / "epoch_0.ckpt").exists()


def test_train_int8_feed(workdir):
    """--feature_dtype int8 trains end to end: quantized img_q/img_scale
    batches through the loader, dequant on device (VERDICT r1 item 4).
    --use_int8 composes: training stays on the differentiable f32 path,
    the in-loop eval runs the int8 MXU attention projection."""
    path, root = workdir
    run_cli("main.py", common_args(root, [
        "--mode", "train", "--comment", "cli_int8",
        "--predictor_type", "base", "--decoder_type", "none",
        "--select_path", "vqa",
        "--feature_dtype", "int8", "--use_int8", "1",
    ]), cwd=path)
    ckpt = path / "checkpoint" / "cli_int8"
    assert (ckpt / "best_model.ckpt").exists()


def test_train_int8_feed_mtl(workdir):
    """--feature_dtype int8 + MTL caption training: the decoder's
    teacher-forcing scan takes the FACTORED int8 path (encoder v_q8/v_w ->
    ops/decode_scan.py factored_v) end to end through the CLI, with finite
    losses and the usual artifacts."""
    path, root = workdir
    proc = run_cli("main.py", common_args(root, [
        "--mode", "train", "--comment", "cli_int8_mtl",
        "--predictor_type", "base", "--decoder_type", "butd",
        "--use_mtl", "1", "--feature_dtype", "int8",
        "--c_len", str(root["c_len"]),
    ]), cwd=path)
    ckpt = path / "checkpoint" / "cli_int8_mtl"
    assert (ckpt / "epoch_0.ckpt").exists()
    assert "nan" not in proc.stdout.lower().split("avg_loss")[-1][:40]


def test_train_with_length_bucketing(workdir):
    """--length_bucket 1: bucketed caption batches train through the CLI
    (MTL config shape) and produce finite losses + the usual artifacts."""
    path, root = workdir
    proc = run_cli("main.py", common_args(root, [
        "--mode", "train", "--comment", "cli_bucket",
        "--predictor_type", "base", "--decoder_type", "butd",
        "--use_mtl", "1", "--length_bucket", "1",
        "--c_len", str(root["c_len"]),
        # custom bounds (incl. one >= c_len that must be dropped: c_len
        # itself is always the last bucket)
        "--bucket_bounds", f"4,6,{root['c_len'] + 5}",
    ]), cwd=path)
    ckpt = path / "checkpoint" / "cli_bucket"
    assert (ckpt / "epoch_0.ckpt").exists()
    assert "nan" not in proc.stdout.lower().split("avg_loss")[-1][:40]
