"""A-priori memory footprint estimation.

Analog of the reference estimator (``/root/reference/illico/utils/memory.py:8-36``),
extended with a device (HBM) term: peak host memory = result arrays + in-flight
tile buffers; peak device memory = padded tile + sort scratch.
"""

from __future__ import annotations

import os

from illico_tpu.utils.log import logger

__all__ = ["estimate_memory_usage", "host_tile_budget", "log_memory_usage"]


def _mem_available_bytes() -> int | None:
    """``MemAvailable`` from /proc/meminfo, or None when unreadable."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return None


def host_tile_budget() -> int:
    """Host-memory budget (bytes) for in-flight input tiles.

    The reference's host high-watermark is a published contract
    (``/root/reference/README.md:188-225``: 114 MiB at K562 scale); this
    build streams densified tiles instead of sparse windows, so the analog
    is a budget that the auto tile width must respect.  Priority:
    ``ILLICO_TPU_HOST_BUDGET`` env override (bytes), else 25% of the
    machine's currently-available RAM, clamped to [256 MB, 8 GB]; 1 GB when
    availability cannot be read (non-Linux).
    """
    env = os.environ.get("ILLICO_TPU_HOST_BUDGET")
    if env:
        try:
            return max(int(float(env)), 1 << 20)
        except (ValueError, OverflowError):  # "abc", "inf", "nan"
            logger.warning(
                "Ignoring unparseable ILLICO_TPU_HOST_BUDGET=%r.", env
            )
    avail = _mem_available_bytes()
    if avail is None:
        return int(1e9)
    budget = int(min(max(avail // 4, 256 * 2**20), 8 * 2**30))
    # Quantize DOWN to a power of two: MemAvailable jitters run-to-run,
    # and an unquantized budget would flip the derived tile width between
    # processes — changing the (shape, dtype) executable signature and
    # defeating the persistent compile cache (minutes per fresh compile
    # over a remote-compile link).
    return 1 << (budget.bit_length() - 1)


def estimate_memory_usage(
    handler,
    group_info,
    tile_width: int,
    n_threads: int,
    *,
    engine: str = "sort",
    v_buckets: int = 128,
    value_itemsize: int = 4,
):
    """Return (host_bytes, device_bytes) estimates for the given engine."""
    n_groups = group_info.n_groups
    n_cells, n_genes = handler.shape
    # Host: the (G, n_genes, 3) result buffer, the (G, n_genes) tie buffer
    # and the in-flight prefetch tiles.
    results = n_groups * n_genes * 3 * 8
    tie = n_groups * n_genes * 8
    n_prefetch = max(2, n_threads)
    host_tiles = n_prefetch * handler.tile_footprint(tile_width)
    host = results + tie + host_tiles
    tile_bytes = n_cells * tile_width * value_itemsize
    if engine == "hist":
        # Raw + gathered tile, then the dominant histogram workspace: the
        # (G, V, T) f32 histogram plus a float64 contraction temporary of
        # the same extent (~12 B/element — the term that bounds the auto
        # tile width).
        device = int(
            tile_bytes * 2 + n_groups * v_buckets * tile_width * 12
        )
    else:
        # Raw tile + padded gather + ~2 sort operand sets + payloads.
        device = int(tile_bytes * 6)
    return host, device


def log_memory_usage(handler, group_info, tile_width: int, n_threads: int, **kw):
    host, device = estimate_memory_usage(
        handler, group_info, tile_width, n_threads, **kw
    )
    logger.trace(
        "Estimated peak memory: host ~%.1f MB, device (HBM) ~%.1f MB.",
        host / 1e6, device / 1e6,
    )
    return host, device
