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
            ocp.test_utils.erase_and_create_empty(directory) if False else directory,
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
