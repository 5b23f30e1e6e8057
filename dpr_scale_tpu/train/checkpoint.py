"""Orbax checkpointing: top-k-on-metric + always-keep-last.

Parity with the reference's ModelCheckpoint callback
(conf/checkpoint_callback/default.yaml: monitor valid_mrr max,
save_top_k 3, save_last true) and the warm-start/load paths
(dpr_task.py:73-79, dpr_eval_task.py:20-25).
"""
from __future__ import annotations

import os
import threading
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        monitor: str = "mrr",
        mode: str = "max",
        save_top_k: int = 3,
        save_last: bool = True,
        async_save: bool = False,
    ):
        self.directory = os.path.abspath(directory)
        self.monitor = monitor
        self.save_last = save_last
        # async_save overlaps the device->host state fetch (the expensive
        # leg: ~40 MB/s over this environment's TPU tunnel, a PCIe fetch
        # elsewhere) and the disk serialization with further training
        # steps. One save is in flight at a time; readers (best_step/
        # restore/restore_last/close) barrier on it first.
        self.async_save = async_save
        self._pending: Optional[threading.Thread] = None
        self._pending_error: Optional[BaseException] = None
        # missing-monitor sentinel must be the WORST value for the mode:
        # -inf under mode="min" would rank a metric-less save (periodic
        # save, empty val set) as the BEST checkpoint and evict genuinely
        # better ones at max_to_keep
        worst = float("-inf") if mode == "max" else float("inf")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=(lambda metrics: metrics.get(monitor, worst))
            if save_top_k > 0
            else None,
            best_mode=mode,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._last_dir = os.path.join(self.directory, "last")

    def save(self, step: int, state, metrics: Optional[Dict[str, float]] = None):
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        if not self.async_save:
            # Fetch device->host ONCE (the expensive direction — ~40 MB/s
            # over this environment's warmed TPU tunnel, a PCIe fetch
            # elsewhere); both the step save and the "last" save then
            # serialize the same host arrays without touching the device
            # again.
            self._save_host(step, jax.device_get(state), metrics)
            return
        self.wait()  # one in-flight save; also surfaces prior failures
        # The train step DONATES its state buffers (donate_argnums=(0,)),
        # so the caller's arrays are invalidated by the very next step —
        # snapshot to fresh HBM buffers first (an on-device copy, ~free
        # next to the tunneled fetch), then fetch+serialize off-thread.
        snap = jax.tree_util.tree_map(
            lambda x: jax.numpy.copy(x) if isinstance(x, jax.Array) else x,
            state,
        )

        def _bg():
            try:
                self._save_host(step, jax.device_get(snap), metrics)
            except BaseException as e:  # re-raised at the next barrier
                self._pending_error = e

        t = threading.Thread(target=_bg, name=f"ckpt-save-{step}", daemon=True)
        self._pending = t
        t.start()

    def wait(self) -> None:
        """Barrier on the in-flight async save (no-op when idle)."""
        t, self._pending = self._pending, None
        if t is not None:
            t.join()
        if self._pending_error is not None:
            err, self._pending_error = self._pending_error, None
            raise err

    def _save_host(self, step: int, host_state, metrics: Dict[str, float]):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(host_state),
            metrics=metrics,
        )
        self._mgr.wait_until_finished()
        if self.save_last:
            # "last" is written directly from the host copy, NOT copied
            # from the step dir: when the step's metric does not make the
            # top-k, orbax's retention GC deletes the step dir inside
            # _mgr.save itself — copying after the fact races with that
            # eviction (observed as FileNotFoundError on ckpt/<step>/default
            # in the campaign drill). A direct serialize costs the same
            # disk write as the copy and has no dependency on rotation.
            self._write_last(host_state)

    def _write_last(self, host_state) -> None:
        """Atomically replace last/state with a fresh serialization.

        Crash-safe against SIGKILL mid-write (the supervise/requeue drill
        kills the training process at arbitrary points): the save lands in
        a temp dir first, and the old tree survives as state.old until the
        new one is in place; restore_last falls back to state.old.
        """
        import shutil

        dst = os.path.join(self._last_dir, "state")
        tmp = dst + ".tmp"
        old = dst + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(tmp, host_state, force=True)
        ckptr.wait_until_finished()
        ckptr.close()
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(dst):
            os.rename(dst, old)
        os.rename(tmp, dst)
        shutil.rmtree(old, ignore_errors=True)

    def best_step(self) -> Optional[int]:
        self.wait()
        return self._mgr.best_step()

    def restore(self, state_like, step: Optional[int] = None):
        """Restore best (default) or a specific step, shaped like state_like."""
        self.wait()
        step = step if step is not None else self._mgr.best_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def restore_last(self, state_like):
        self.wait()
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(self._last_dir, "state")
        if not os.path.isdir(path) and os.path.isdir(path + ".old"):
            path += ".old"  # killed mid-_copy_last; the previous save is intact
        return ckptr.restore(path, state_like)

    def close(self):
        self.wait()
        self._mgr.close()


def save_params(path: str, params) -> None:
    """One-shot params-only save (for encoder export / eval handoff)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, params_like=None):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), params_like)
