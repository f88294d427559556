"""Public API: TPU-native asymptotic Wilcoxon rank-sum tests.

Drop-in equivalent of the reference entry point
(``/root/reference/illico/asymptotic_wilcoxon.py:71-258``): same signature,
same output DataFrame contract (MultiIndex ``(pert, feature)``, columns
``p_value``, ``statistic``, ``fold_change``), same validation errors — with
the compute re-designed for TPU (see :mod:`illico_tpu.ops.rank_engine`).

Accepts ``anndata.AnnData`` (when installed), this package's
:class:`illico_tpu.io.h5ad.AnnDataLite`, or any duck-typed object exposing
``.X``, ``.obs``, ``.var_names`` and optionally ``.layers``.  A raw-array
variant :func:`asymptotic_wilcoxon_arrays` skips the AnnData wrapper.
"""

from __future__ import annotations

import time as _time
from typing import Literal

import numpy as np
import pandas as pd

from illico_tpu.models.wilcoxon import WilcoxonRunner
from illico_tpu.utils.groups import encode_and_count_groups
from illico_tpu.utils.log import logger
from illico_tpu.utils.registry import data_handler_registry, ensure_backed_handlers

__all__ = ["asymptotic_wilcoxon", "asymptotic_wilcoxon_arrays"]


def asymptotic_wilcoxon(
    adata,
    is_log1p: bool,
    group_keys: str,
    reference: str | None = None,
    n_threads: int = 1,
    batch_size: int | Literal["auto"] = "auto",
    alternative: str = "two-sided",
    use_continuity: bool = True,
    tie_correct: bool = True,
    layer: str | None = None,
    precompile: bool = True,
    device=None,
    devices: int | tuple[int, int] | None = None,
    progress: bool = True,
    engine: str = "auto",
    profile_dir: str | None = None,
) -> pd.DataFrame:
    """Asymptotic Mann-Whitney (Wilcoxon rank-sum) differential expression.

    Performs one-versus-rest (OVR) tests when ``reference`` is None, else
    one-versus-one (OVO) tests of every group against ``reference``, per gene.
    Supports in-RAM dense / CSR / CSC matrices and h5ad-backed dense / CSC
    matrices (backed CSR is not supported — same contract as the reference).

    Parameters mirror the reference API (``asymptotic_wilcoxon.py:71-83``);
    ``n_threads`` controls host-side tile prefetching (the TPU replaces the
    reference's compute threads), ``device`` optionally pins a jax device.
    ``devices`` (int > 1) shards every gene tile over a 1-D mesh of that
    many devices (the reference's thread pool at chip granularity; columns
    are independent, so the hot path has zero cross-chip collectives).
    A ``(cell_devices, gene_devices)`` tuple builds a 2-D mesh that also
    shards the *cell* axis — histogram-engine only: per-shard histograms
    are additive, so one ``psum`` reconstructs the exact global counts
    (:mod:`illico_tpu.parallel.cells`).
    ``engine`` selects the device kernel: ``"hist"`` (histogram contraction,
    the fast path for integer-count / log1p data, with automatic per-column
    fallback), ``"sort"`` (general full-column comparison-sort engine),
    ``"csort"`` (compact sort: ranks only the nonzeros of sparse-enough
    host-resident data — normalized/scaled floats included — and adds the
    zero block analytically), or ``"auto"`` (hist for tabulable counts,
    csort for sparse non-tabulable host data, sort otherwise).

    Returns a DataFrame indexed by (pert, feature) with columns
    ``p_value``, ``statistic`` (U of the reference sample, exact), and
    ``fold_change``.
    """
    if alternative not in ("two-sided", "greater", "less"):
        raise ValueError(f"Unsupported alternative hypothesis: {alternative}")
    ensure_backed_handlers()
    if layer is not None:
        logger.info(f"Using layer '{layer}' for differential expression.")
        X = adata.layers[layer]
    else:
        X = adata.X

    handler = data_handler_registry.get(X)
    handler.validate()

    t0 = _time.perf_counter()
    raw_groups = np.asarray(adata.obs[group_keys])
    unique_groups, info = encode_and_count_groups(raw_groups, reference)
    logger.trace("Group encoding: %.2fs.", _time.perf_counter() - t0)
    logger.info(
        "Found %d unique groups (min size: %d cells; max size: %d cells), "
        "with reference group: %s",
        info.n_groups, int(info.counts.min()), int(info.counts.max()), reference,
    )

    from illico_tpu.parallel.cells import mesh_from_spec

    mesh = mesh_from_spec(devices)

    t0 = _time.perf_counter()
    runner = WilcoxonRunner(
        handler,
        info,
        is_log1p=is_log1p,
        batch_size=batch_size,
        n_threads=n_threads,
        use_continuity=use_continuity,
        tie_correct=tie_correct,
        alternative=alternative,
        device=device,
        engine=engine,
        mesh=mesh,
    )
    logger.trace("Runner setup: %.2fs.", _time.perf_counter() - t0)
    if precompile:
        runner.precompile()
    res = runner.run(progress=progress, profile_dir=profile_dir)

    t0 = _time.perf_counter()
    if res.stacked is not None:
        stacked = res.stacked.reshape(-1, 3)  # zero-copy
    else:
        stacked = np.stack(
            [res.pvalues, res.statistics, res.fold_change], axis=-1
        ).reshape(-1, 3)
    df = build_result_frame(unique_groups, adata.var_names, stacked)
    logger.trace("Result assembly: %.2fs.", _time.perf_counter() - t0)
    return df


def build_result_frame(unique_groups, var_names, stacked) -> pd.DataFrame:
    """Assemble the output DataFrame contract from a (n_groups*n_genes, 3)
    [p, U, fc] block (MultiIndex ``(pert, feature)``, three named columns —
    ``/root/reference/illico/asymptotic_wilcoxon.py:252-256``)."""
    rows = pd.Series(unique_groups, name="pert", dtype=str)
    cols = pd.Series(np.asarray(var_names), name="feature", dtype=str)
    return pd.DataFrame(
        data=stacked,
        index=pd.MultiIndex.from_product([rows, cols], names=["pert", "feature"]),
        columns=["p_value", "statistic", "fold_change"],
        copy=False,
    )


def asymptotic_wilcoxon_arrays(
    X,
    groups,
    *,
    is_log1p: bool = False,
    reference: str | None = None,
    var_names=None,
    **kwargs,
) -> pd.DataFrame:
    """Array-first variant: ``X`` (n_cells, n_genes) + per-cell group labels."""
    from illico_tpu.io.h5ad import AnnDataLite

    groups = np.asarray(groups)
    obs = pd.DataFrame({"group": groups})
    var = pd.DataFrame(
        index=(
            pd.Index(var_names)
            if var_names is not None
            else pd.Index([f"gene_{i}" for i in range(X.shape[1])])
        )
    )
    adata = AnnDataLite(X, obs, var)
    return asymptotic_wilcoxon(
        adata, is_log1p=is_log1p, group_keys="group", reference=reference, **kwargs
    )
