"""Sharding-aware checkpoint save/restore (orbax).

The reference delegates model checkpointing to HF Trainer (save every N
steps to output_dir, ``scripts/training.py:92-104``; ZeRO-3 gathers 16-bit
weights on save, ``src/train.py:193``). Orbax handles the TPU equivalent
natively: each host writes its param shards, restore re-shards to the
current mesh -- no gather step needed.
"""

from typing import Any

import jax

from ..utils import get_logger

logger = get_logger()


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = directory
        self.manager = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        logger.info(f"saved checkpoint at step {step}")

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, state_like: Any, step: int | None = None) -> Any:
        """Restore into the sharding/structure of ``state_like`` (an abstract
        or concrete TrainState)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape")
            else x,
            state_like,
        )
        restored = self.manager.restore(step, args=self._ocp.args.StandardRestore(abstract))
        logger.info(f"restored checkpoint from step {step}")
        return restored

    def wait(self) -> None:
        self.manager.wait_until_finished()


def restore_params(directory: str, params_like: Any, step: int | None = None) -> Any:
    """Params-only restore from another run's checkpoint: the
    pretrain -> finetune chain (the reference loads the saved pretrain model
    via ``from_pretrained``, ``src/models/llava.py:151-152`` /
    ``src/models/vilt.py:359-360``). The donor's optimizer state and step
    counter are deliberately NOT taken -- a finetune starts fresh.

    ``params_like`` (the finetune session's initialized params) provides the
    expected structure, dtypes, and shardings; a structure mismatch fails
    loudly inside orbax rather than training from half-garbage.
    """
    import os

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")

    raw = ocp.PyTreeCheckpointer().restore(os.path.join(directory, str(step), "default"))
    raw_params = raw["params"] if isinstance(raw, dict) else raw.params
    # conform to the template: tree.map enforces identical structure; dtype
    # follows the template (e.g. a finetune phase running a different
    # compute dtype than the donor)
    params = jax.tree.map(lambda like, got: jnp.asarray(got, dtype=like.dtype), params_like, raw_params)
    logger.info(f"chained params from {directory} @ step {step}")
    return params
