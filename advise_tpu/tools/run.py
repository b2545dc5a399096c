"""Entry point: ``python -m advise_tpu.tools.run --cfg X.yaml --output DIR
[--opts] K V ...``

Reference: ``tools/run.py:23-76`` + ``scripts/launch_r50.sh``. One process
drives the whole mesh (no torchrun); cfg.PIPELINE phases run sequentially.
"""

from __future__ import annotations

import logging
import os

import jax

# honor JAX_PLATFORMS even when a site plugin pre-registered a backend
# (this image's sitecustomize registers the TPU tunnel before user code)
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from advise_tpu.config import assert_and_infer_cfg, load_config, parse_args
from advise_tpu.engine.train import trainer
from advise_tpu.engine.validate import validation
from advise_tpu.models import build_model
from advise_tpu.parallel import build_mesh, distributed_init
from advise_tpu.utils.logging import get_commit_sha, setup_logger

logger = logging.getLogger(__name__)


def enable_compile_cache(cfg) -> None:
    """Persistent XLA compilation cache (TPU.COMPILE_CACHE_DIR): reuse
    serialized executables across processes so restarts skip the
    minutes-long large-program compiles. Backends without executable
    serialization make this a warned no-op."""
    path = getattr(cfg.TPU, "COMPILE_CACHE_DIR", "")
    if not path:
        return
    path = os.path.expanduser(path)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even fast compiles: resume latency, not disk, is scarce
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        logger.warning("compilation cache disabled: %s", e)


def main(argv=None):
    args = parse_args(argv)
    cfg = assert_and_infer_cfg(load_config(args))
    distributed_init(cfg)
    setup_logger(cfg)
    enable_compile_cache(cfg)
    cfg.COMMIT_SHA = get_commit_sha()
    logger.info("devices: %s", jax.devices())
    logger.info("commit: %s", cfg.COMMIT_SHA)

    tb = None
    if cfg.RANK == 0:
        try:
            from tensorboardX import SummaryWriter

            tb = SummaryWriter(logdir=cfg.LOGDIR)
        except Exception:
            tb = None

    state = None
    for phase in cfg.PIPELINE:
        if phase == "train":
            logger.info("=== phase: train (task=%s) ===", cfg.TASK)
            state = trainer(cfg, tb_logger=tb)
        elif phase.endswith("_val"):
            val_type = phase[: -len("_val")]
            assert val_type == "speed", f"val type {val_type} not implemented"
            logger.info("=== phase: %s ===", phase)
            model = build_model(cfg)
            if state is None:
                state = _load_eval_state(cfg)
            validation(cfg, model, state)
        elif phase.endswith("_infer"):
            infer_type = phase[: -len("_infer")]
            assert infer_type == "action", f"infer type {infer_type} not implemented"
            logger.info("=== phase: %s ===", phase)
            from advise_tpu.engine.inference import inference

            model = build_model(cfg)
            if state is None:
                state = _load_eval_state(cfg)
            inference(cfg, model, state)
        else:
            raise NotImplementedError(f"pipeline phase: {phase}")
    logger.info("pipeline complete")


def _load_eval_state(cfg):
    """Load Model_Best (or MODELDATA/RESUME) for eval-only pipelines
    (reference utils/misc.py model_init :62-83)."""
    import jax.numpy as jnp

    from advise_tpu.engine.checkpoint import CheckpointManager
    from advise_tpu.engine.train import build_train_state, _TxProxy
    from advise_tpu.models import build_model

    model_init = build_model(cfg, sync_axes=())
    state = build_train_state(
        cfg, model_init, _TxProxy(), jax.random.PRNGKey(cfg.INFER.SEED)
    )
    mgr = CheckpointManager(cfg)
    import os

    path = cfg.MODELDATA or cfg.RESUME or os.path.join(
        cfg.LOGDIR, "checkpoints", "Model_Best"
    )
    if os.path.isdir(path):
        state = mgr.restore(path, state)
        logger.info("eval state loaded from %s", path)
    else:
        logger.warning("no checkpoint at %s — evaluating random init", path)
    return state


if __name__ == "__main__":
    main()
