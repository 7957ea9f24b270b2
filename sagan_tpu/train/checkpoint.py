"""Orbax checkpointing — the analog of the reference's twin
``tf.train.CheckpointManager``s (/root/reference/sagan/main.py:149-152,
243-253): G+D variables, both optimizer states, the step counter and the
PRNG key are saved as one pytree, step-indexed, keep-10, with a
restore-latest-or-initialize-from-scratch path at startup.

Improvement over the reference: the full ``TrainState`` (including
Adam moments and RNG) round-trips, so resume is bit-exact; the reference
loses dataset position and fixed latents (SURVEY.md §5 Checkpoint).
"""

from __future__ import annotations

import os

import jax


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state) -> None:
        self.mgr.save(step, args=self._ocp.args.StandardSave(state))

    def restore_latest(self, abstract_state):
        """Restore the newest checkpoint shaped like ``abstract_state``;
        None if the directory has no checkpoints."""
        latest = self.mgr.latest_step()
        if latest is None:
            return None

        def _abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            if hasattr(x, "shape"):
                return jax.ShapeDtypeStruct(x.shape, x.dtype)
            return x

        target = jax.tree.map(_abstract, abstract_state)
        return self.mgr.restore(
            latest, args=self._ocp.args.StandardRestore(target))

    def latest_step(self):
        return self.mgr.latest_step()

    def wait(self) -> None:
        self.mgr.wait_until_finished()

    def close(self) -> None:
        self.mgr.close()
