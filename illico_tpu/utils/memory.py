"""A-priori memory footprint estimation.

Analog of the reference estimator (``/root/reference/illico/utils/memory.py:8-36``),
extended with a device (HBM) term: peak host memory = result arrays + in-flight
tile buffers; peak device memory = padded tile + sort scratch.
"""

from __future__ import annotations

from illico_tpu.utils.log import logger

__all__ = ["estimate_memory_usage", "log_memory_usage"]


def estimate_memory_usage(handler, group_info, tile_width: int, n_threads: int):
    """Return (host_bytes, device_bytes) estimates."""
    n_groups = group_info.n_groups
    n_cells, n_genes = handler.shape
    results = n_groups * n_genes * 3 * 8  # U, tie/p, fc in float64
    n_prefetch = max(2, n_threads)
    host_tiles = n_prefetch * handler.tile_footprint(tile_width)
    host = results + host_tiles
    # Device: raw tile + padded gather + ~2 sort operand sets + payloads.
    tile_bytes = n_cells * tile_width * 4
    device = int(tile_bytes * 6)
    return host, device


def log_memory_usage(handler, group_info, tile_width: int, n_threads: int):
    host, device = estimate_memory_usage(handler, group_info, tile_width, n_threads)
    logger.trace(
        "Estimated peak memory: host ~%.1f MB, device (HBM) ~%.1f MB.",
        host / 1e6, device / 1e6,
    )
    return host, device
