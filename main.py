"""CLI entry point: train / val / decode.

TPU-native port of `/root/reference/main.py:109-334` with the same mode
dispatch and artifact layout (``checkpoint/<exp>/``). Differences by design:
device placement flags are inert (mesh sharding supersedes them), checkpoints
carry full train state, and decode runs the batched on-device beam search at
the full batch size instead of forcing batch_size=1 (main.py:317).
"""

from __future__ import annotations

import json
import os
import time
import traceback

import numpy as np

if os.environ.get("VQA_TPU_PLATFORM"):
    # test hook: force a platform (e.g. cpu) even when a TPU plugin pinned
    # jax_platforms via config at interpreter start
    import jax
    jax.config.update("jax_platforms", os.environ["VQA_TPU_PLATFORM"])

if os.environ.get("VQA_TPU_MULTIHOST"):
    # multi-host pod slice: one process per host over DCN
    # (SURVEY.md section 5.8); mesh axes then span all hosts' devices.
    # On TPU pods initialize() auto-discovers coordination; the VQA_TPU_COORD
    # triple drives manual coordination (the 2-process CPU test, or
    # non-pod clusters without cluster-env autodetection).
    import jax
    if os.environ.get("VQA_TPU_PLATFORM") == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if os.environ.get("VQA_TPU_COORD"):
        jax.distributed.initialize(
            coordinator_address=os.environ["VQA_TPU_COORD"],
            num_processes=int(os.environ["VQA_TPU_NPROCS"]),
            process_id=int(os.environ["VQA_TPU_PROC_ID"]))
    else:
        jax.distributed.initialize()

from vqa_tpu.config import Argument, parse_args, save_args, dataset_type_from_args
from vqa_tpu.data.dataset import set_dataset
from vqa_tpu.data.loader import Loader
from vqa_tpu.data.tokenizer import Vocab
from vqa_tpu.models.wrapper import set_model
from vqa_tpu.ops.embedding import load_glove_table
from vqa_tpu.parallel.mesh import make_mesh
from vqa_tpu.tools.beam import make_beam_search, tokens_to_captions
from vqa_tpu.training.checkpoint import load_checkpoint, load_params
from vqa_tpu.training.logging import Logger, MetricsWriter
from vqa_tpu.training.state import create_train_state, make_eval_step
from vqa_tpu.training.train import train, train_select, evaluate, model_batch
from vqa_tpu.training import optim as optim_lib


def build_model(args, vocab: Vocab, ans_list):
    frozen = None
    if args.pretrained_embed_path and os.path.exists(args.pretrained_embed_path):
        frozen = load_glove_table(args.pretrained_embed_path)
    return set_model(
        encoder_type=args.encoder_type,
        predictor_type=args.predictor_type,
        decoder_type=args.decoder_type,
        ntoken=len(vocab),
        v_dim=args.v_dim,
        embed_dim=args.embed_dim,
        hidden_dim=args.hidden_dim,
        decoder_hidden_dim=args.decoder_hidden_dim,
        rnn_layer=args.rnn_layer,
        ans_dim=len(ans_list),
        cls_layer=args.cls_layer,
        c_len=args.c_len,
        dropout=args.dropout,
        rnn_type=args.rnn_type,
        att_type=args.att_type,
        conv_layer=args.conv_layer,
        conv_type=args.conv_type,
        use_spa=bool(getattr(args, "use_spa", 1)),
        use_imp=bool(getattr(args, "use_imp", 0)),
        use_sem=bool(getattr(args, "use_sem", 0)),
        use_mtl=args.use_mtl,
        frozen_embedding=frozen,
        use_pallas=getattr(args, "use_pallas", False),
        use_int8=getattr(args, "use_int8", False),
    )


def make_loader(args, vocab, ans_list, dataset_type, is_train=False,
                is_val=False, shuffle=False):
    graph_path = args.graph_path if args.encoder_type == "relation" else ""
    feature_dtype = getattr(args, "feature_dtype", "float32")
    ds = set_dataset(
        load_path=args.load_path,
        feature_path=args.feature_path,
        ans_dim=len(ans_list),
        caption_id_path=args.select_path,
        graph_path=graph_path,
        is_train=is_train,
        is_val=is_val,
        dataset_type=dataset_type,
        # int8: loader emits quantized img_q/img_scale batches; the model
        # dequantizes on device (encoder.py _visual_input) — 4x fewer
        # host->HBM feature bytes than f32
        feature_mode="int8" if feature_dtype == "int8" else "float32",
    )
    transform = None
    if feature_dtype not in ("float32", "int8"):
        dtype = np.dtype(feature_dtype)

        def transform(batch, _dtype=dtype):
            batch["img"] = batch["img"].astype(_dtype)
            return batch
    import jax
    if jax.process_count() > 1:
        # multi-host: each process loads a disjoint shard of the epoch;
        # batch_size is per host (global batch = batch_size * process_count)
        return Loader.for_process(ds, args.batch_size, shuffle=shuffle,
                                  seed=args.seed, transform=transform)
    # caption length bucketing: training feed only (decode/eval runs the
    # generator at full max_len regardless)
    bucket = bool(getattr(args, "length_bucket", 0)) and is_train \
        and args.decoder_type != "none"
    bounds = tuple(
        int(b) for b in
        str(getattr(args, "bucket_bounds", "8,10,12,14,16")).split(",") if b)
    bounds = tuple(b for b in bounds if b < args.c_len) + (args.c_len,)
    return Loader(ds, args.batch_size, shuffle=shuffle, seed=args.seed,
                  transform=transform, length_bucket=bucket,
                  bucket_bounds=bounds)


def main():
    args = parse_args()
    if args.load_setting:
        args = Argument(os.path.join("checkpoint", args.comment))
    # --val_every N overrides the reference's derived mid-epoch validation
    # (select_path == 'none' -> samples-modulus quirk; see training/train.py)
    val_checkpoint = (getattr(args, "val_every", 0)
                      or (args.select_path == "none"))

    logger = Logger(args.comment)
    vocab = Vocab.load(args.vocab_path)
    with open(args.ans_path, encoding="utf-8") as f:
        ans_list = f.read().split("\n")
    save_path = os.path.join("checkpoint", args.comment)
    save_args(args, save_path)
    logger.write(repr(args.__dict__))

    model = build_model(args, vocab, ans_list)
    print("model ready.")
    mesh = make_mesh(n_model=args.n_model_shards)
    dataset_type = dataset_type_from_args(args)

    if args.mode == "train":
        train_loader = make_loader(args, vocab, ans_list, dataset_type,
                                   is_train=True, shuffle=args.shuffle)
        val_loader = make_loader(args, vocab, ans_list, dataset_type,
                                 is_val=True)

        best_score = 0.0
        init_state = None
        if args.start_epoch != 0:
            # resume: full state from the previous epoch checkpoint
            path = os.path.join(save_path, f"epoch_{args.start_epoch - 1}.ckpt")
            steps = args.batches or len(train_loader)
            tx = optim_lib.make_optimizer(
                lr=args.lr, lr_vqa=args.lr_vqa, lr_cap=args.lr_cap,
                warm_up=args.warm_up, step_size=args.step_size,
                gamma=args.gamma, steps_per_epoch=steps)
            sample = model_batch(next(iter(train_loader)))
            blank = create_train_state(
                model, tx, sample, seed=args.seed,
                prng_impl=getattr(args, "prng_impl", None) or None)
            restored = load_checkpoint(path, blank)
            init_state = restored["state"]
            best_score = restored["best_score"]
            print("load parameters:", path)
        elif args.load_model != "":
            # warm start params only (strict=False semantics, main.py:214-217)
            path = os.path.join(save_path, args.load_model)
            steps = args.batches or len(train_loader)
            tx = optim_lib.make_optimizer(
                lr=args.lr, lr_vqa=args.lr_vqa, lr_cap=args.lr_cap,
                warm_up=args.warm_up, step_size=args.step_size,
                gamma=args.gamma, steps_per_epoch=steps)
            sample = model_batch(next(iter(train_loader)))
            blank = create_train_state(
                model, tx, sample, seed=args.seed,
                prng_impl=getattr(args, "prng_impl", None) or None)
            from vqa_tpu.training.checkpoint import merge_params
            merged = merge_params(blank.params, load_params(path))
            init_state = blank.replace(params=merged)
            print("load parameters:", path)

        if getattr(args, "train_dtype", "float32") not in ("float32", "f32", ""):
            # the bf16 default silently changes numerics vs the reference
            # f32 recipe — announce it so trajectory diffs are attributable
            logger.show(f"[notice] train_dtype={args.train_dtype}: matmuls run "
                        "in mixed precision (master params/moments stay f32); "
                        "pass --train_dtype float32 for bit-exact "
                        "reference-recipe numerics")
        print("start training.")
        common = dict(model=model, lr=args.lr, val_loader=val_loader,
                      num_epoches=args.epoches, save_path=save_path,
                      logger=logger, checkpoint=10000, max_norm=0.25,
                      comment=args.comment + "_train",
                      start_epoch=args.start_epoch, batches=args.batches,
                      best_score=best_score, warm_up=args.warm_up,
                      step_size=args.step_size, gamma=args.gamma,
                      lr_vqa=args.lr_vqa, lr_cap=args.lr_cap,
                      val_checkpoint=val_checkpoint, seed=args.seed,
                      mesh=mesh, init_state=init_state,
                      profile_dir=args.profile_dir or None,
                      train_dtype=getattr(args, "train_dtype", "float32"),
                      prng_impl=getattr(args, "prng_impl", None) or None)
        if getattr(args, "train_strategy", "joint") == "select":
            # max-relevance candidate training over the all-captions dataset
            from vqa_tpu.data.dataset import set_dataset as _sd
            all_ds = _sd(load_path=args.load_path,
                         feature_path=args.feature_path,
                         ans_dim=len(ans_list),
                         caption_id_path=args.select_path,
                         graph_path=args.graph_path
                         if args.encoder_type == "relation" else "",
                         is_train=True, dataset_type="all")
            sel_loader = Loader(all_ds, args.batch_size, shuffle=args.shuffle,
                                seed=args.seed, batch_method="get_batch_all",
                                length=len(all_ds.questions))
            train_select(train_loader=sel_loader, **common)
        else:
            train(train_loader=train_loader, **common)

    import jax as _jax
    is_main = _jax.process_index() == 0
    if _jax.process_count() > 1:
        # all hosts must see process 0's checkpoints (shared FS) before the
        # collective eval/decode paths read them
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("vqa_tpu:post_train")

    if args.mode in ("train", "val") and args.predictor_type != "none":
        load_model = args.load_model or os.path.join(save_path, "best_model.ckpt")
        params = load_params(load_model)
        print("load parameters: ", load_model)

        index_path = os.path.join(args.load_path, args.index_path)
        if index_path.endswith(".pkl"):
            # reference-compatible pickle index (main.py:252-253)
            import pickle
            with open(index_path, "rb") as f:
                ans_index = pickle.load(f)
        else:
            with open(index_path) as f:
                ans_index = json.load(f)

        val_loader = make_loader(args, vocab, ans_list, dataset_type,
                                 is_val=True)
        # evaluate() is collective (every process feeds its loader shard);
        # artifact writes happen on process 0 only
        writer = (MetricsWriter(save_path, comment=args.comment + "_val")
                  if is_main else None)
        eval_step = make_eval_step(model)
        metric = evaluate(eval_step, params, val_loader, logger=logger,
                          writer=writer, ans_index=ans_index,
                          save_path=os.path.join(save_path, "valid")
                          if is_main else None,
                          mesh=mesh)
        for i in metric:
            print(f"{i}\t {metric[i] * 100:.4f} %")
        if writer is None:
            return
        writer.add_hparams(
            hparams={"name": args.comment, "embed_dim": args.embed_dim,
                     "hidden_dim": args.hidden_dim,
                     "rnn_layer": args.rnn_layer,
                     "cls_layer": args.cls_layer,
                     "gcn_layer": args.conv_layer,
                     "dropout": args.dropout},
            metrics=metric)
        writer.close()
    elif args.mode in ("train", "val"):
        print("predictor_type none: no VQA head to validate; skipping "
              "val (decode mode scores captions via cap_eval.py).")

    if args.mode == "decode":
        load_model = args.load_model or os.path.join(save_path, "best_model.ckpt")
        if not os.path.exists(load_model) and not args.load_model:
            # fall back to the newest epoch checkpoint (a caption-only run
            # trained before the best-by-caption-loss fix, or an interrupted
            # one, may have epochs but no best_model.ckpt)
            import glob
            epochs = glob.glob(os.path.join(save_path, "epoch_*.ckpt"))
            if epochs:
                load_model = max(epochs, key=os.path.getmtime)
        params = load_params(load_model)
        print("load parameters: ", load_model)
        import jax
        import jax.numpy as jnp
        decode_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            getattr(args, "decode_dtype", "float32")]
        if decode_dtype != jnp.float32:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(decode_dtype)
                if x.dtype == jnp.float32 else x, params)
        val_loader = make_loader(args, vocab, ans_list, dataset_type,
                                 is_val=True)
        # --use_pallas also routes the beam vocab head through the fused
        # kernel (GEMM + running top-k + online logsumexp, vocab_topk.py)
        beam = make_beam_search(model, k=3, c_len=args.c_len,
                                start_id=vocab.start, end_id=vocab.end,
                                fused_vocab=getattr(args, "use_pallas", False),
                                approx_topk=bool(
                                    getattr(args, "approx_topk", 0)))
        with open(os.path.join(save_path, "decode.txt"), "w") as f:
            for batch in val_loader:
                nvalid = int(batch.pop("nvalid"))
                mb = model_batch(batch)
                if decode_dtype != jnp.float32:
                    if "img" in mb:
                        mb["img"] = jnp.asarray(mb["img"]).astype(decode_dtype)
                    if "img_scale" in mb:
                        # scale dtype drives the on-device dequant dtype
                        # (models/encoder.py _visual_input)
                        mb["img_scale"] = jnp.asarray(
                            mb["img_scale"]).astype(decode_dtype)
                tokens, _ = beam(params, mb)
                caps = tokens_to_captions(np.asarray(tokens)[:nvalid, 0, :],
                                          vocab, vocab.end)
                for c in caps:
                    f.write(c + "\n")


if __name__ == "__main__":
    try:
        main()
    except Exception:
        error = traceback.format_exc()
        print(error)
        os.makedirs("checkpoint", exist_ok=True)
        with open("checkpoint/error.txt", "w") as f:
            f.write(time.ctime())
            f.write("\n")
            f.write(error)
        raise SystemExit(1)
