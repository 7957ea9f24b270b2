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

    def restore_step(self, step: int, abstract_state):
        """Restore one specific checkpointed step (raises KeyError when
        the step does not exist)."""
        if step not in set(self.mgr.all_steps()):
            raise KeyError(
                f"no checkpoint at step {step}; available: "
                f"{sorted(self.mgr.all_steps())}")
        target = jax.tree.map(self._abstract, abstract_state)
        return self.mgr.restore(
            step, args=self._ocp.args.StandardRestore(target))

    @staticmethod
    def _abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        if hasattr(x, "shape"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        return x

    def restore_latest(self, abstract_state):
        """Restore the newest readable checkpoint shaped like
        ``abstract_state``; None if the directory has no checkpoints.

        Robustness beyond the reference (whose ``restore(...)
        .assert_consumed()`` simply crashes, sagan/main.py:243-253):
        Orbax's commit markers already exclude partially-written steps,
        but a committed checkpoint can still rot post-commit (disk
        corruption, truncated arrays after a host crash).  If the
        newest step fails to restore, fall back to the next older one
        instead of killing the run, and report what happened.
        """
        steps = sorted(self.mgr.all_steps(), reverse=True)
        if not steps:
            return None

        target = jax.tree.map(self._abstract, abstract_state)
        last_err, bad_steps = None, []
        restored = None
        multi = jax.process_count() > 1
        for step in steps:
            restored = None
            # Retry once before declaring the step unreadable: a
            # transient failure (network-FS hiccup, momentary OOM during
            # restore) must not cost the newest checkpoint.
            for attempt in (1, 2):
                try:
                    restored = self.mgr.restore(
                        step, args=self._ocp.args.StandardRestore(target))
                    break
                except Exception as ex:
                    last_err = ex
                    if attempt == 1:
                        print(f"checkpoint step {step} failed to restore "
                              f"({type(ex).__name__}: {ex}); retrying "
                              f"once", flush=True)
            if multi:
                # The restore/fallback DECISION must be collective: if
                # one host's shard read fails while another's succeeds,
                # the hosts would otherwise restore different steps
                # (silently divergent replicated state) and enter
                # _quarantine's barriers unevenly (deadlock).  Everyone
                # agrees on the step's fate before moving on.  (A host
                # failing INSIDE a collective Orbax read while the
                # others block is an Orbax-level hang this cannot fix —
                # this coordinates the decision layer above it.)
                import numpy as np
                from jax.experimental import multihost_utils

                all_ok = bool(np.asarray(multihost_utils.process_allgather(
                    np.asarray(restored is not None))).all())
                if not all_ok and restored is not None:
                    print(f"checkpoint step {step}: another host failed "
                          f"to restore — discarding the local restore so "
                          f"all hosts fall back together", flush=True)
                    restored = None
            if restored is not None:
                break
            print(f"checkpoint step {step} is unreadable after retry; "
                  f"falling back to an older checkpoint", flush=True)
            bad_steps.append(step)
        if restored is None:
            raise RuntimeError(
                f"all {len(steps)} checkpoints under the manager are "
                f"unreadable; newest failure: {last_err!r}")
        # Quarantine (NOT delete) the corrupt steps: Orbax silently
        # skips `save(step)` when the step already exists, so a resumed
        # run that re-reaches a rotten step number would never replace
        # it — and every restore would fall back again, losing all
        # progress past the older checkpoint each time.  Renaming the
        # step dir to <step>.corrupt unblocks re-saving while keeping
        # the bytes on disk for forensics.
        for step in bad_steps:
            try:
                self._quarantine(step)
            except Exception as ex:
                print(f"could not quarantine unreadable checkpoint step "
                      f"{step}: {ex}", flush=True)
        return restored

    def _step_dirs(self, step: int) -> list:
        """Step dirs under the manager root matching ``step``: Orbax
        names them "<step>" (or "<prefix>_<step>" / zero-padded under
        non-default options) — match any dir whose trailing numeric
        component equals the step."""
        root = str(self.mgr.directory)
        out = []
        for entry in os.listdir(root):
            src = os.path.join(root, entry)
            tail = entry.rsplit("_", 1)[-1]
            if os.path.isdir(src) and tail.isdigit() and int(tail) == step:
                out.append(src)
        return out

    @staticmethod
    def _rename_dirs(step: int, dirs: list) -> None:
        for src in dirs:
            dst = src + ".corrupt"
            if os.path.exists(dst):
                import shutil
                shutil.rmtree(dst)
            os.rename(src, dst)
            print(f"quarantined unreadable checkpoint step {step} -> "
                  f"{dst}", flush=True)

    def _quarantine(self, step: int) -> None:
        """Rename the rotten step dir out of the manager's way.

        Multi-host: the checkpoint directory is shared, so only process
        0 touches the filesystem — unsynchronized per-process renames
        would race (losers keep the rotten step in their manager's step
        cache and later silently skip ``save(step)``, desyncing the
        cross-host save barrier).  All processes agree on
        found/not-found via an allgather (itself a barrier), process 0
        renames, everyone barriers again, then every process reloads
        its step cache."""
        if jax.process_count() > 1:
            import numpy as np
            from jax.experimental import multihost_utils

            found = np.asarray(multihost_utils.process_allgather(
                np.asarray(bool(self._step_dirs(step))))).any()
            if not found:
                # orbax-coordinated collective delete (all processes)
                self.mgr.delete(step)
                print(f"deleted unreadable checkpoint step {step} (no "
                      f"step dir found to quarantine)", flush=True)
                return
            if jax.process_index() == 0:
                self._rename_dirs(step, self._step_dirs(step))
            multihost_utils.sync_global_devices(
                f"ckpt_quarantine_{step}")
            self.mgr.reload()
            return
        dirs = self._step_dirs(step)
        if not dirs:
            # fall back to deletion through the manager rather than
            # leaving the rotten step blocking future saves
            self.mgr.delete(step)
            print(f"deleted unreadable checkpoint step {step} (no step "
                  f"dir found to quarantine)", flush=True)
            return
        self._rename_dirs(step, dirs)
        # refresh the manager's step cache after the rename
        self.mgr.reload()

    def latest_step(self):
        return self.mgr.latest_step()

    def wait(self) -> None:
        self.mgr.wait_until_finished()

    def close(self) -> None:
        self.mgr.close()
