"""Training checkpoint / resume (orbax).

The aux subsystem the reference has no analog for (SURVEY.md §5: inference
models are immutable ONNX files; here training is first-class, so crash
recovery and warm restarts need real checkpoints).  Saves the full
TrainState (params, optimizer state, batch stats, step) atomically with
orbax; ``latest_step``/``restore`` resume interrupted runs.
"""

from __future__ import annotations

from pathlib import Path
from .trainer import TrainState

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str | Path, keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep),
        )

    def save(self, step: int, state: TrainState) -> None:
        import orbax.checkpoint as ocp

        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "batch_stats": state.batch_stats,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of ``template`` (shapes/dtypes must
        match the run that saved)."""
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir}")
        payload = {
            "params": template.params,
            "opt_state": template.opt_state,
            "batch_stats": template.batch_stats,
            "step": template.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(payload)
        )
        return TrainState(
            restored["params"],
            restored["opt_state"],
            restored["batch_stats"],
            restored["step"],
        )

    def close(self) -> None:
        self._mgr.close()
