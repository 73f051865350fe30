"""MFU / FLOP accounting for benchmarked programs.

The reference publishes no performance numbers (BASELINE.md), so this build's
"fast" claims need their own roofline: every BENCH_*.json reports, per jitted
program, the XLA-counted FLOPs (`compiled.cost_analysis()`), the achieved
FLOP/s over the measured wall time, and MFU = achieved / chip peak.

Peak table: bf16 systolic-array peaks per chip from Google's published specs
(the public scaling-book hardware chapter). XLA's `flops` counter counts a
multiply-add as 2 FLOPs, matching how the peaks are quoted.
"""

from __future__ import annotations

from typing import Any

import jax

# device_kind (as reported by jax.devices()[0].device_kind) -> peak bf16
# FLOP/s per chip. Entries cover the kinds this framework is expected to see;
# unknown kinds fall back to v5e (the BASELINE.md target chip).
_PEAK_BF16: dict[str, float] = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "TPU v6e": 918e12,
}
_DEFAULT_PEAK = 197e12  # v5e — the north-star chip (BASELINE.md)


def chip_peak_flops(device: Any | None = None) -> float:
    """Peak bf16 FLOP/s of the current (or given) accelerator chip."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "") or ""
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name):
            return peak
    return _DEFAULT_PEAK


def program_cost(fn, *args, **kwargs) -> dict:
    """Lower+compile `fn` for the given example args and return XLA's cost
    analysis: {"flops": float, "bytes_accessed": float} (0.0 when the backend
    does not expose a counter).

    `fn` may be a jitted function, a packed-params callable
    (utils/packing.BoundJit / jit_with_packed_params — unwrapped so the
    weights lower as ARGUMENTS, not hundreds of MB of HLO constants), or a
    plain callable (jitted here). The compile hits the persistent cache when
    the program was already compiled this process/session.
    """
    if hasattr(fn, "jitted") and hasattr(fn, "bound_args"):
        args = (*fn.bound_args, *args)
        fn = fn.jitted
    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    lowered = jfn.lower(*args, **kwargs)
    try:
        costs = lowered.compile().cost_analysis()
    except Exception:
        # Tunneled remote-compile endpoints can reject large programs
        # (HTTP 413/500). The pre-compile estimate from the unoptimized HLO
        # counts the same matmul/conv FLOPs (fusion changes bytes more than
        # flops); better an estimate than an "error" field in the artifact.
        costs = lowered.cost_analysis()
    # cost_analysis() returns a dict (newer jax) or a 1-element list of dicts
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    costs = costs or {}
    return {
        "flops": float(costs.get("flops", 0.0)),
        "bytes_accessed": float(costs.get("bytes accessed", 0.0)),
    }


def mfu_report(flops_per_call: float, seconds_per_call: float,
               device: Any | None = None) -> dict:
    """Achieved FLOP/s and MFU for a measured program.

    Also classifies the likely binding resource when byte counts are supplied
    via `roofline_note` (callers attach their own note); here we return just
    the numbers.
    """
    peak = chip_peak_flops(device)
    achieved = flops_per_call / max(seconds_per_call, 1e-12)
    return {
        "flops_per_call": flops_per_call,
        "achieved_tflops": round(achieved / 1e12, 3),
        "peak_tflops": round(peak / 1e12, 1),
        "mfu": round(achieved / peak, 4),
    }


def program_mfu(fn, seconds_per_call: float, *args,
                device: Any | None = None, **kwargs) -> dict:
    """Convenience: cost_analysis + MFU in one call.

    Returns {"flops_per_call", "bytes_accessed", "achieved_tflops",
    "peak_tflops", "mfu", "arithmetic_intensity"} — intensity (FLOPs/byte)
    against the chip's HBM ridge point tells compute- vs memory-bound.
    """
    cost = program_cost(fn, *args, **kwargs)
    rep = mfu_report(cost["flops"], seconds_per_call, device)
    rep["bytes_accessed"] = cost["bytes_accessed"]
    if cost["bytes_accessed"] > 0:
        rep["arithmetic_intensity"] = round(
            cost["flops"] / cost["bytes_accessed"], 2)
    return rep
