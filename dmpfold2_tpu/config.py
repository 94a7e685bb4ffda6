"""Unified configuration (SURVEY §5: single dataclass, CLI-overridable).

The reference scatters configuration across argparse flags (predict.py:169-182)
and module constants (train.py:21-33); here one dataclass covers the engine
and maps 1:1 onto the reference CLI flags, with TPU-specific knobs added.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class FoldConfig:
    # reference-compatible knobs (predict.py:26-28, 169-182)
    iterations: int = 10
    minsteps: int = 100
    device: str | None = None        # accepted for parity; JAX auto-places
    template: str | None = None
    weights_file: str | None = None

    # TPU-native knobs
    precision: str = "fp32"          # "bf16": trunk convs on the MXU in bf16
    dca_method: str = "auto"         # "lu" | "cholesky" | "schur" | "blocked"
    use_buckets: bool = True         # single-target engine only; the batch
                                     # streamer always buckets (grouping
                                     # targets by shape IS its batching)
    vgru_impl: str = "auto"          # "pallas" | "scan" | "auto"

    @classmethod
    def from_cli_args(cls, args) -> "FoldConfig":
        # -t is nargs="+" at the CLI (per-target templates in batch mode);
        # this single-target config takes the lone path, '-' meaning none
        template = args.template
        if isinstance(template, (list, tuple)):
            template = template[0] if template else None
        if template == "-":
            template = None
        cfg = cls(
            iterations=args.iterations,
            minsteps=args.minsteps,
            device=args.device,
            template=template,
            weights_file=args.model_weights,
        )
        # TPU-native knobs are optional CLI additions (reference has 6 flags)
        for name in ("precision", "dca_method", "vgru_impl"):
            if getattr(args, name, None) is not None:
                setattr(cfg, name, getattr(args, name))
        return cfg


@dataclass
class TrainConfig:
    """Training constants (reference train.py:21-33) plus TPU additions."""

    batch_size: int = 32             # gradient-accumulation span
    max_aln_size: int = 300 * 1000   # MSA area budget
    crop_len: int = 350
    max_iterations: int = 3          # max recycling loops
    restart: bool = True
    refine_steps: int = 100
    micro_batch: int = 1
    learning_rate_restart: float = 1e-4
    learning_rate_scratch: float = 3e-4
    # "auto": natively-batched forward (fused-Pallas-capable) off-mesh,
    # vmapped spmd_axis_name path under a mesh; True/False force it
    native_batch: str | bool = "auto"
