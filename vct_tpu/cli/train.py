"""Training CLI — the reference ``train.py`` entry point, TPU-native.

Reference contract (``train.py:292-315``): ``-c/--config`` JSON,
``-ws/--world_size``, device flags; this driver keeps those and adds
``--resume`` (full train-state resume, a capability the reference lacks —
its checkpoints are bare state_dicts, SURVEY.md §5).

No torchrun / process-per-GPU: one process drives the whole chip mesh via
GSPMD (``-ws`` sets the data-mesh size; default = all devices).
"""

from __future__ import annotations

import argparse
import os

from vct_tpu.cli.common import add_device_args, configure_hardware, load_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train MMT4Caption on TPU")
    p.add_argument("-c", "--config", required=True, type=str,
                   help="The path of '.json' config file")
    p.add_argument("-ws", "--world_size", default=-1, type=int,
                   help="data-parallel mesh size (-1 = all devices)")
    p.add_argument("--resume", type=str, default=None,
                   help="orbax checkpoint to resume (optimizer+epoch included); "
                        "'auto' resumes from <save_dir>/<tag>_latest if present")
    p.add_argument("--no_tensorboard", action="store_true")
    p.add_argument("--profile", type=str, default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the first train epoch "
                        "to DIR (view with TensorBoard/Perfetto)")
    add_device_args(p)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    configure_hardware(args)

    import dataclasses

    from vct_tpu.train.loop import Trainer
    from vct_tpu.utils import setup_seed

    cfg = load_config(args.config)
    if args.world_size > 0:
        cfg = cfg.replace(tpu=dataclasses.replace(cfg.tpu, mesh_data=args.world_size))
    setup_seed(cfg.tpu.seed)
    print(cfg.display())

    writer = None
    if not args.no_tensorboard:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(cfg.train.log_dir, cfg.train.tag))
        except ImportError:
            print("tensorboardX unavailable; logging to stdout only")

    trainer = Trainer(cfg, writer=writer)
    if args.resume == "auto":
        latest = os.path.join(cfg.train.save_dir, cfg.train.tag + "_latest")
        if os.path.isdir(latest):
            trainer.resume(latest)
        else:
            print(f"--resume auto: no checkpoint at {latest}, starting fresh")
    elif args.resume:
        trainer.resume(args.resume)
    if args.profile:
        # Tracing/profiling: the aux subsystem the reference lacks entirely
        # (SURVEY.md §5). One epoch is enough to see the step breakdown. The
        # pre-profile train state is restored so the real run is unaffected
        # (no hidden extra epoch of updates).
        import jax

        from vct_tpu.parallel.mesh import shard_train_state

        # host copy: the train step donates its input state, so the live
        # device buffers are invalidated by the profiled epoch
        state_before = jax.device_get(trainer.state)
        jax.profiler.start_trace(args.profile)
        trainer.train_epoch(trainer.start_epoch)
        jax.profiler.stop_trace()
        # re-place with the TRAINING shardings (replicate() would silently
        # drop tensor-parallel layouts on a mesh_model>1 run; this is the
        # same call resume() uses)
        trainer.state = shard_train_state(trainer.mesh, state_before)
        print(f"profile trace written to {args.profile}")
    scores = trainer.fit()
    if writer is not None:
        writer.close()
    print("final scores:", scores)


if __name__ == "__main__":
    main()
