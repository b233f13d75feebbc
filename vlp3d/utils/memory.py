"""Device-memory observability.

The reference has no memory tracking at all (SURVEY §5: hand-rolled
wall-clock timers only); on TPU the per-device HBM high-water mark is
the number that decides whether a config fits, so the solver logs it
per epoch and vlp3d-serve exposes it in /stats. PjRt backends that do
not implement memory_stats (the tunneled axon relay returns None; CPU
likewise) degrade to an empty dict — callers just omit the fields.
"""

from __future__ import annotations


def device_memory_mb(device=None) -> dict:
    """{'hbm_in_use_mb', 'hbm_peak_mb', 'hbm_limit_mb'} for one device,
    or {} when the backend doesn't report memory stats."""
    import jax

    if device is None:
        devices = jax.local_devices()
        if not devices:
            return {}
        device = devices[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    out = {}
    mapping = {
        "bytes_in_use": "hbm_in_use_mb",
        "peak_bytes_in_use": "hbm_peak_mb",
        "bytes_limit": "hbm_limit_mb",
    }
    for src, dst in mapping.items():
        if src in stats:
            out[dst] = round(stats[src] / 1e6, 2)
    return out
