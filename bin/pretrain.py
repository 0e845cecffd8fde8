"""MADELEINE multistain pretraining (ref: bin/pretrain.py).

Usage mirrors the reference launch scripts, e.g.:
    python pretrain.py --dataset ACROBAT --data_root_dir <feats_h5> \
        --csv_fpath <ACROBAT.csv> --global_loss info-nce --local_loss got \
        --temperature 0.001 --symmetric_cl --warmup --n_subsamples 2048 \
        --batch_size 65 --max_epochs 120 --precision bfloat16

TPU-native: one jitted train step sharded over the device mesh, rank-gated
checkpointing (orbax train state + reference-compatible model.pt), full
crash resume via --resume.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from madeleine_tpu.utils.platform import apply_platform_env

apply_platform_env()

from madeleine_tpu.parallel import multihost as mh

mh.initialize_from_env()  # no-op unless the env asks for multi-host

import jax
import numpy as np

from madeleine_tpu.data.datasets import Prefetcher, SlideDataset, TrainLoader
from madeleine_tpu.eval.inference import get_downstream_loader, run_inference
from madeleine_tpu.models.madeleine import init_madeleine_params, param_count
from madeleine_tpu.parallel.mesh import make_mesh
from madeleine_tpu.train import checkpoint as ckpt
from madeleine_tpu.train.optim import make_optimizer
from madeleine_tpu.train.trainer import init_train_state, make_train_step, train_loop
from madeleine_tpu.utils.args import get_config
from madeleine_tpu.utils.file_utils import print_network, save_pkl
from madeleine_tpu.utils.seed import set_deterministic_mode

MIN_CHECKPOINT_EPOCH = 20  # ref: bin/pretrain.py:69 (no saves for first 20 epochs)


def main() -> None:
    cfg = get_config()
    extras = getattr(cfg, "_extras", {})
    set_deterministic_mode(cfg.seed)

    os.makedirs(cfg.RESULTS_SAVE_PATH, exist_ok=True)
    cfg.save(os.path.join(cfg.RESULTS_SAVE_PATH, "config.json"))
    print(f"* Running experiment {cfg.EXP_CODE}")
    print(f"* Results dir: {cfg.RESULTS_SAVE_PATH}")

    from madeleine_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(cfg.RESULTS_SAVE_PATH, use_wandb=cfg.log_ml,
                           project=extras.get("wandb_project_name", "MADELEINE"),
                           run_name=cfg.EXP_CODE, config=cfg.to_dict(),
                           tags=[cfg.cohort])

    # ---- data -----------------------------------------------------------
    pi, pc = jax.process_index(), jax.process_count()
    mh_kw = dict(process_index=pi, process_count=pc) if pc > 1 else {}
    native = extras.get("native_loader", "auto")
    if native == "auto":
        import glob
        native = "on" if glob.glob(os.path.join(cfg.data_root_dir or "",
                                                "*.bag")) else "off"
    if native == "on":
        # bf16 training: assemble batches directly in bfloat16 — half the
        # batch bytes (memcpy from bf16 disk) and no host-side cast in the
        # train loop; the batch is born in the transfer dtype
        from madeleine_tpu.native.bagio import bf16_dtype

        out_dtype = ("bfloat16" if cfg.precision == "bfloat16"
                     and bf16_dtype() is not None else "float32")
        if cfg.n_subsamples == -1:
            from madeleine_tpu.native.dataset import NativeRaggedLoader

            loader = NativeRaggedLoader(
                cfg.csv_fpath, cfg.data_root_dir, cfg.MODALITIES,
                embedding_size=cfg.patch_embedding_dim,
                batch_size=cfg.batch_size, shuffle=True, seed=cfg.seed,
                out_dtype=out_dtype, **mh_kw)
            print("* Native .bag loader, full-bag (ragged) batches "
                  f"({out_dtype} assembly)")
        else:
            from madeleine_tpu.native.dataset import NativeTrainLoader

            loader = NativeTrainLoader(
                cfg.csv_fpath, cfg.data_root_dir, cfg.MODALITIES,
                embedding_size=cfg.patch_embedding_dim, sample=cfg.n_subsamples,
                batch_size=cfg.batch_size, shuffle=True, seed=cfg.seed,
                per_case_seed=pc > 1, out_dtype=out_dtype, **mh_kw)
            print(f"* Native .bag loader (C++ threaded assembler, "
                  f"{out_dtype} assembly)")
        n_cases = len(loader.df)
    else:
        dataset = SlideDataset(
            dataset_name=cfg.dataset,
            csv_path=cfg.csv_fpath,
            features_path=cfg.data_root_dir,
            sample=cfg.n_subsamples,
            modalities=cfg.MODALITIES,
            embedding_size=cfg.patch_embedding_dim,
            rng=np.random.default_rng(cfg.seed),
            per_case_seed=pc > 1, seed=cfg.seed,
        )
        if cfg.n_subsamples == -1:
            from madeleine_tpu.data.datasets import RaggedTrainLoader

            loader = RaggedTrainLoader(dataset, cfg.batch_size, shuffle=True,
                                       seed=cfg.seed, **mh_kw)
            print("* Full-bag (ragged) training: padded length buckets + "
                  "token masks")
        else:
            loader = TrainLoader(dataset, cfg.batch_size, shuffle=True,
                                 seed=cfg.seed, **mh_kw)
        n_cases = len(dataset)
    steps_per_epoch = len(loader)
    print(f"* {n_cases} cases, {steps_per_epoch} steps/epoch")

    # ---- mesh / model / optim ------------------------------------------
    n_dev = cfg.mesh_shape or len(jax.devices())
    mesh = make_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        print(f"* Data-parallel mesh over {n_dev} devices"
              + (f" across {pc} hosts" if pc > 1 else ""))

    params = init_madeleine_params(jax.random.PRNGKey(cfg.seed), cfg)
    print(f"* Model parameters: {param_count(params):,}")
    print_network(params, cfg, results_dir=cfg.RESULTS_SAVE_PATH)

    tx, schedule = make_optimizer(cfg, steps_per_epoch)
    state = init_train_state(params, tx)
    train_step = make_train_step(cfg, tx, mesh=mesh)

    start_epoch, best_rank = 0, 0.0
    resume_dir = extras.get("resume")
    state_dir = os.path.join(cfg.RESULTS_SAVE_PATH, "train_state")
    if resume_dir or (cfg.pretrained is None and os.path.exists(state_dir)):
        src = resume_dir or state_dir
        meta = ckpt.load_metadata(src) or {}
        state = ckpt.restore_train_state(src, {"params": state.params,
                                               "opt_state": state.opt_state,
                                               "step": state.step})
        from madeleine_tpu.train.trainer import TrainState
        state = TrainState(**state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_rank = float(meta.get("best_rank", 0.0))
        print(f"* Resumed from {src} at epoch {start_epoch} "
              f"(best_rank={best_rank:.2f})")

    # ---- profiling ------------------------------------------------------
    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)

    # ---- epochs ---------------------------------------------------------
    rng_key = jax.random.PRNGKey(cfg.seed)
    for epoch in range(start_epoch, cfg.max_epochs):
        print(f"\nTraining for epoch {epoch}...")
        start = time.time()
        loader.set_epoch(epoch)  # deterministic resume: shuffle keyed by epoch
        state, ep_loss, train_rank, agg = train_loop(
            cfg, train_step, state, Prefetcher(loader), epoch, rng_key,
            mesh=mesh, log_every=0)
        print(f"Done with epoch {epoch}: loss={ep_loss:.3f} "
              f"rank={train_rank:.3f} time={time.time() - start:.1f}s "
              f"({agg['n_skipped']} skipped)")
        logger.log({"train_loss": ep_loss, "train_rank": train_rank,
                    "epoch_time": agg["epoch_time"],
                    "n_skipped": agg["n_skipped"], "epoch": epoch},
                   step=epoch)

        improved = epoch > MIN_CHECKPOINT_EPOCH and train_rank > best_rank
        # multi-host: rank/loss are identical on every host (global metrics),
        # so the gating is consistent; only the primary touches the filesystem.
        # Replicated arrays are host-local readable -> materialize to numpy
        # before a primary-only orbax save.
        if improved and mh.is_primary():
            print(f"Better rank: {best_rank} --> {train_rank}. Saving model")
            ckpt.save_best_torch(cfg.RESULTS_SAVE_PATH, state.params, cfg)
        if improved:
            best_rank = train_rank
        if (improved or (cfg.checkpoint_every and
                         (epoch + 1) % cfg.checkpoint_every == 0)) \
                and mh.is_primary():
            to_host = (lambda t: jax.tree.map(np.asarray, t)) if pc > 1 \
                else (lambda t: t)
            ckpt.save_train_state(
                state_dir,
                {"params": to_host(state.params),
                 "opt_state": to_host(state.opt_state),
                 "step": to_host(state.step)},
                metadata={"epoch": epoch, "best_rank": best_rank,
                          "train_rank": train_rank, "loss": float(ep_loss)})

    if cfg.profile_dir:
        jax.profiler.stop_trace()
    print("\nDone with training\n")

    # final save if rank-gating never fired (short runs)
    model_pt = os.path.join(cfg.RESULTS_SAVE_PATH, "model.pt")
    if not os.path.exists(model_pt) and mh.is_primary():
        ckpt.save_best_torch(cfg.RESULTS_SAVE_PATH, state.params, cfg)

    # ---- downstream slide extraction -----------------------------------
    downstream = extras.get("downstream_dir")
    if downstream:
        loader = get_downstream_loader(downstream)
        res, rank = run_inference(state.params, cfg, loader)
        name = os.path.basename(os.path.normpath(downstream)) or "downstream"
        save_pkl(os.path.join(cfg.RESULTS_SAVE_PATH, f"{name}.pkl"), res)
        print(f"Rank for {name} = {rank}")
        logger.summary(f"{name}_rank", rank)

    logger.close()
    print("\n" + 100 * "-" + "\nEnd of experiment, bye!\n" + 100 * "-")


if __name__ == "__main__":
    main()
