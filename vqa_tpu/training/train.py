"""Training and evaluation loops.

Mirrors the reference experiment runtime (`/root/reference/train.py`):
Adamax + StepLR with warm-up, grad-clip, per-batch scalar logging, per-epoch
checkpoint + best-model tracking, optional mid-epoch validation — but the
per-batch body is one compiled TPU step and batches stream through the
prefetching loader with fixed shapes.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from vqa_tpu.models.wrapper import VQAModel
from vqa_tpu.training import optim as optim_lib
from vqa_tpu.training.state import (
    TrainState, create_train_state, make_train_step, make_eval_step,
)
from vqa_tpu.training.checkpoint import (
    save_checkpoint, save_checkpoint_async, wait_for_checkpoints,
)
from vqa_tpu.training.logging import Logger, MetricsWriter
from vqa_tpu.parallel.mesh import shard_batch

MODEL_KEYS = ("img", "img_q", "img_scale", "q", "a", "c", "cap_len", "graph",
              "c_all", "cap_len_all")


def model_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip loader bookkeeping keys; keep only model inputs."""
    return {k: batch[k] for k in MODEL_KEYS if k in batch}


def _local_rows(garr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in global order.

    Under ``make_array_from_process_local_data`` each host's input rows land
    on its own devices, so concatenating the addressable shards by global
    row offset recovers exactly the rows this host fed.
    """
    shards = sorted(garr.addressable_shards,
                    key=lambda sh: sh.index[0].start or 0)
    return np.concatenate([np.asarray(sh.data) for sh in shards])


def evaluate(eval_step,
             params,
             dataloader,
             logger: Optional[Logger] = None,
             writer: Optional[MetricsWriter] = None,
             ans_index: Optional[Dict] = None,
             save_path: Optional[str] = None,
             mesh=None):
    """VQA evaluation (reference train.py:162-222).

    Returns (score, bound) or the per-answer-type metric dict when
    ``ans_index`` is given. Padded tail rows are masked via ``nvalid``.

    Multi-host: each process scores only the rows it fed (its loader
    shard), then per-sample results are allgathered and deduplicated by
    sample id (the sharded Loader wrap-pads short shards with repeats,
    loader.py shard_length) so the global score and the answer-type
    breakdown are exact and in dataset order.
    """
    multihost = jax.process_count() > 1
    score = 0.0
    target_score = 0.0
    all_score, all_label, all_bound, all_id = [], [], [], []
    l = dataloader.num_samples
    start = time.time()

    for i, batch in enumerate(dataloader):
        nvalid = int(batch.pop("nvalid"))
        ids = np.asarray(batch["id"]) if "id" in batch else None
        mb = model_batch(batch)
        if mesh is not None:
            mb = shard_batch(mesh, mb)
        s, label, bound = eval_step(params, mb)
        if multihost:
            s, label, bound = (_local_rows(s), _local_rows(label),
                               _local_rows(bound))
        s = np.asarray(s)[:nvalid]
        label = np.asarray(label)[:nvalid]
        bound = np.asarray(bound)[:nvalid]
        score += float(s.sum())
        target_score += float(bound.sum())
        all_score.append(s)
        all_label.append(label)
        all_bound.append(bound)
        if ids is not None:
            all_id.append(ids[:nvalid])
        if writer:
            writer.add_scalar("val/vqa/score", score / l, i)

    if multihost:
        from jax.experimental import multihost_utils
        assert all_id, "multi-host evaluate needs sample ids in batches"
        packed = np.concatenate(
            [np.concatenate(all_id).astype(np.float64),
             np.concatenate(all_score).astype(np.float64),
             np.concatenate(all_label).astype(np.float64),
             np.concatenate(all_bound).astype(np.float64)])
        gathered = np.asarray(multihost_utils.process_allgather(packed))
        per = gathered.shape[-1] // 4
        ids = gathered[:, 0 * per:1 * per].reshape(-1)
        scores = gathered[:, 1 * per:2 * per].reshape(-1)
        labels = gathered[:, 2 * per:3 * per].reshape(-1)
        bounds = gathered[:, 3 * per:4 * per].reshape(-1)
        # dedupe wrap-pad repeats; reorder to dataset order for ans_index
        _, keep = np.unique(ids.astype(np.int64), return_index=True)
        all_score = [scores[keep].astype(np.float32)]
        all_label = [labels[keep].astype(np.int32)]
        l = len(keep)
        score = float(scores[keep].sum())
        target_score = float(bounds[keep].sum())

    score /= l
    target_score /= l
    if logger:
        t = time.strftime("%H:%M:%S", time.gmtime(time.time() - start))
        logger.show(f"[{t}] evaluate score: {score:.10f} / bound: {target_score:.10f}")

    all_score = np.concatenate(all_score)
    all_label = np.concatenate(all_label)
    if save_path:
        os.makedirs(save_path, exist_ok=True)
        np.save(os.path.join(save_path, "scores.npy"), all_score)
        np.save(os.path.join(save_path, "labels.npy"), all_label)

    if ans_index is not None:
        output = {}
        for ans in ans_index:
            idx = np.asarray(ans_index[ans])
            # A mismatched index file is a data bug — fail loudly instead of
            # silently dropping rows (the reference crashes here too,
            # train.py:211-220).
            if idx.size and idx.max() >= len(all_score):
                raise ValueError(
                    f"answer-type index '{ans}' refers to sample "
                    f"{int(idx.max())} but only {len(all_score)} evaluated "
                    "samples exist — index file does not match the val split")
            output["hparam/" + ans] = float(all_score[idx].sum() / max(len(idx), 1))
        if logger:
            for k in output:
                logger.write(f"\t{k}: {output[k]:.10f}")
        output["hparam/score"] = score
        return output
    return score, target_score


def train(model: VQAModel,
          lr: float,
          train_loader,
          val_loader,
          logger: Logger,
          save_path: str,
          num_epoches: int,
          comment: str = "",
          checkpoint: int = 10000,
          start_epoch: int = 0,
          batches: int = 0,
          max_norm: float = 0.25,
          best_score: float = 0.0,
          warm_up: int = 0,
          step_size: int = 0,
          gamma: float = 0.5,
          lr_vqa: float = 0.0,
          lr_cap: float = 0.0,
          val_checkpoint: int = 0,
          seed: int = 1111,
          mesh=None,
          ans_index: Optional[Dict] = None,
          init_state: Optional[TrainState] = None,
          profile_dir: Optional[str] = None,
          profile_steps: tuple = (10, 20),
          step_factory=make_train_step,
          init_method: str = "get_loss",
          train_dtype: str = "float32",
          prng_impl: str | None = None):
    """Train loop (reference train.py:11-136). Returns the final TrainState.

    ``profile_dir``: if set, capture a jax.profiler trace (Perfetto/XPlane)
    of global steps [profile_steps) — the reference has no profiling at all
    (SURVEY.md section 5.1).
    """
    writer = MetricsWriter(save_path, comment=comment)
    steps_per_epoch = batches if batches else len(train_loader)

    tx = optim_lib.make_optimizer(
        lr=lr, lr_vqa=lr_vqa, lr_cap=lr_cap, max_norm=max_norm,
        warm_up=warm_up, step_size=step_size, gamma=gamma,
        steps_per_epoch=steps_per_epoch)

    # Initialize state from the first batch's shapes.
    sample = None
    for b in train_loader:
        sample = model_batch(b)
        break
    assert sample is not None, "empty train loader"
    if init_state is not None:
        state = init_state
    elif init_method == "select":
        import functools
        import jax.numpy as jnp
        from vqa_tpu.training.select import get_select_loss
        root = jax.random.key(seed, impl=prng_impl)
        init_key, run_key = jax.random.split(root)
        variables = model.init({"params": init_key, "dropout": run_key},
                               sample,
                               method=functools.partial(get_select_loss,
                                                        deterministic=True))
        state = TrainState(params=variables["params"],
                           opt_state=tx.init(variables["params"]),
                           step=jnp.int32(0), rng=run_key)
    else:
        state = create_train_state(model, tx, sample, seed=seed,
                                   prng_impl=prng_impl)
    if mesh is not None and jax.process_count() > 1:
        # multi-host: host-local init arrays must become global (replicated)
        # arrays before they can enter the SPMD train step together with the
        # globally-sharded batches (every host inits identically — same seed,
        # same shapes — so replication is value-correct)
        from vqa_tpu.parallel.mesh import replicate_global
        state = replicate_global(mesh, state)
    # bf16 mixed precision: master params/moments f32, matmuls bf16
    # (PERF.md "bf16 training"); default f32 matches the reference exactly.
    compute_dtype = None
    if train_dtype not in ("float32", "f32", ""):
        import jax.numpy as jnp
        compute_dtype = jnp.dtype(train_dtype)
    train_step = (step_factory(model, tx, compute_dtype=compute_dtype)
                  if compute_dtype is not None else step_factory(model, tx))
    eval_step = make_eval_step(model)

    has_predictor = model.predictor is not None
    best_epoch = start_epoch
    # multi-host: params are replicated, so only process 0 writes checkpoints
    # (concurrent same-path writes over a shared FS would race on the .tmp)
    is_main = jax.process_index() == 0

    def val(avg_loss, best_score, best_epoch, epoch, start):
        if has_predictor:
            eval_score, bound = evaluate(eval_step, state.params, val_loader,
                                         mesh=mesh)
            t = time.strftime("%H:%M:%S", time.gmtime(time.time() - start))
            logger.show(f"[Epoch {epoch}] avg_loss: {avg_loss:.4f} | "
                        f"score: {eval_score:.10f} ({t})")
            writer.add_scalar("train/eval", eval_score, epoch)
            best_path = os.path.join(save_path, "best_model.ckpt")
            # strict > like the reference (train.py:79)
            if eval_score > best_score:
                if is_main:
                    save_checkpoint(best_path, state, epoch, eval_score)
                best_score = eval_score
                best_epoch = epoch
            elif is_main and not os.path.exists(best_path):
                # materialize a best checkpoint on the first validation so
                # downstream val/decode never find it missing (score can
                # legitimately be 0.0 early) — WITHOUT adopting its score
                # as the threshold: a resumed best_score must keep gating
                # (else a worse model could later overwrite a better best),
                # and the in-memory best_score/best_epoch update must stay
                # host-independent (this branch is is_main-only; updating
                # them here would diverge the hosts' thresholds)
                save_checkpoint(best_path, state, epoch, eval_score)
            logger.show(f"[Result] best epoch: {best_epoch}, "
                        f"score: {best_score:.10f} / {bound:.10f}")
        else:
            logger.show(f"[Epoch {epoch}] avg_loss: {avg_loss:.4f}")
            # Caption-only runs (predictor 'none') have no val score; the
            # reference never writes best_model.pt for them and its decode
            # mode then crashes (main.py:298-302 + train.py:64-87). Track
            # best-by-train-caption-loss instead (stored as -loss so the
            # "higher is better" best_score resume semantics still hold).
            best_path = os.path.join(save_path, "best_model.ckpt")
            if (-avg_loss) > best_score:
                if is_main:
                    save_checkpoint(best_path, state, epoch, -avg_loss)
                best_score = -avg_loss
                best_epoch = epoch
            elif is_main and not os.path.exists(best_path):
                # materialize-only, same rationale as the scored branch
                save_checkpoint(best_path, state, epoch, -avg_loss)
            logger.show(f"[Result] best epoch: {best_epoch}, "
                        f"cap loss: {-best_score:.10f}")
        return best_score, best_epoch

    from vqa_tpu.data.loader import prefetch_to_device

    for epoch in range(start_epoch, num_epoches):
        # join the previous epoch's async checkpoint writes here (not at
        # its end): the epoch save overlaps this epoch's first steps, and
        # outstanding host-state copies stay bounded to one epoch's worth
        wait_for_checkpoints()
        start = time.time()
        avg_loss = 0.0
        prev_loss = 0.0
        i = -1   # loop var survives the loop; -1 = empty loader guard
        # Metric fetch is deferred ONE step: float(metric) blocks until
        # the step completes, so fetching step i-1's scalars only after
        # step i has been dispatched keeps the device busy through the
        # host-side logging + loader work instead of adding it to every
        # step as a bubble. Value/order parity with the reference's
        # per-step .item() is exact — drain() runs before every reader
        # of avg_loss (interval log, validation, epoch end).
        pending = None   # (gstep, device metrics) not yet fetched

        def drain():
            nonlocal avg_loss, pending
            if pending is None:
                return
            pgstep, pmetrics = pending
            pending = None
            pmetrics = jax.device_get(pmetrics)
            writer.add_scalars({k: float(v) for k, v in pmetrics.items()
                                if k != "loss"}, pgstep)
            avg_loss += float(pmetrics["loss"])

        # device transfer runs ahead of compute (double-buffered)
        feed = prefetch_to_device(
            (model_batch(b) for b in train_loader), mesh=mesh, size=2,
            keys=MODEL_KEYS)
        for i, mb in enumerate(feed):
            if batches and i == batches:
                break
            gstep = epoch * steps_per_epoch + i
            if profile_dir and gstep == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
            state, metrics = train_step(state, mb)
            if profile_dir and gstep == profile_steps[1]:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), state.params)
                jax.profiler.stop_trace()
                profile_dir = None  # capture once
            drain()                      # step i-1's scalars, overlapped
            pending = (gstep, metrics)

            if checkpoint and i % checkpoint == 0 and i != 0:
                drain()                  # include step i — exact parity
                t = time.strftime("%H:%M:%S", time.gmtime(time.time() - start))
                logger.write(f"[Batch {i}] loss: "
                             f"{(avg_loss - prev_loss) / checkpoint:.4f} ({t})")
                prev_loss = avg_loss
            # val_checkpoint interval semantics: 1/True replicates the
            # reference's batches-vs-samples modulus quirk (train.py:121 —
            # i % len(dataset.questions), a no-op whenever the epoch has
            # fewer batches than samples); any value > 1 is an explicit
            # validate-every-N-batches interval.
            val_every = (train_loader.num_samples if val_checkpoint in (1, True)
                         else int(val_checkpoint))
            if val_every and i != 0 and i % val_every == 0:
                # mean over the steps actually run so far — dividing the
                # partial sum by steps_per_epoch would deflate the value
                # and, in caption-only runs (best tracked by -avg_loss),
                # freeze best_model.ckpt at early-epoch states
                drain()
                best_score, best_epoch = val(avg_loss / (i + 1),
                                             best_score, best_epoch, epoch,
                                             start)
                if is_main:
                    # interval checkpoints write to unique paths, so the
                    # serialize+fsync can run off-thread without ordering
                    # hazards (best_model.ckpt saves stay synchronous: two
                    # overlapped writers to ONE path could land reordered)
                    save_checkpoint_async(os.path.join(
                        save_path, f"epoch_{epoch}_batch_{i}.ckpt"), state,
                        epoch, best_score)

        # validate FIRST, then write the epoch checkpoint: it stores
        # best_score for resume, and saving pre-validation would understate
        # the threshold whenever this very epoch set a new best (a resume
        # from it could then let a worse model overwrite best_model.ckpt)
        drain()
        best_score, best_epoch = val(avg_loss / max(i + 1, 1), best_score,
                                     best_epoch, epoch, start)
        if is_main:
            # off-thread like the interval saves (unique path per epoch);
            # the join below bounds outstanding writes to one epoch's worth
            save_checkpoint_async(
                os.path.join(save_path, f"epoch_{epoch}.ckpt"),
                state, epoch, best_score)
        if epoch >= warm_up and step_size != 0:
            factor = optim_lib.steplr_factor(epoch + 1, warm_up, step_size, gamma)
            logger.show(f"learning rate factor: {factor}")

    wait_for_checkpoints()
    writer.close()
    return state


def train_select(model: VQAModel,
                 lr: float,
                 train_loader,
                 val_loader,
                 logger: Logger,
                 save_path: str,
                 num_epoches: int,
                 **kwargs):
    """Max-relevance training loop (the reference declares this with a
    ``pass`` body, train.py:139-158; implemented here).

    Same contract as ``train`` but the train_loader must yield all-candidate
    batches (``Loader(dataset, ..., batch_method="get_batch_all",
    length=len(dataset.questions))`` over a VQACaptionAllDataset) and the
    step is the stop-gradient argmin-selection step
    (vqa_tpu/training/select.py).
    """
    from vqa_tpu.training.select import make_train_select_step
    return train(model=model, lr=lr, train_loader=train_loader,
                 val_loader=val_loader, logger=logger, save_path=save_path,
                 num_epoches=num_epoches,
                 step_factory=make_train_select_step,
                 init_method="select", **kwargs)
