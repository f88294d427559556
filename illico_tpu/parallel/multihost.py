"""Multi-host (DCN) execution: per-host gene windows, host-local assembly.

The reference's only scaling axis is the gene (column) axis, split over an
in-process thread pool (``/root/reference/illico/asymptotic_wilcoxon.py:236``)
with each worker fetching its own column window from storage
(``/root/reference/illico/utils/registry.py:162-188``).  The multi-host
TPU topology applies the same fetch pattern at *host* granularity
(SURVEY §2.3/§5):

- Every host owns one contiguous gene window (:func:`host_gene_window`) and
  reads ONLY that window from its storage handler — no host ever touches
  another host's columns, so raw expression data never crosses DCN.
- Each host runs the standard single-host streaming runner over its window,
  sharding tiles across its *local* chips via the existing 1-D ICI gene mesh
  (:mod:`illico_tpu.parallel.mesh`).  The hot path has zero cross-chip and
  zero cross-host communication.
- DCN carries exactly one collective: the final all-gather of the tiny
  ``(n_groups, genes_host, 3)`` result blocks (float64; ~50 MB even at the
  reference's 2k-groups x 8k-genes headline scale), after which every host
  holds the identical full DataFrame.

This mirrors how the reference's threads scatter disjoint column slices of
one shared result buffer (``asymptotic_wilcoxon.py:242-244``) — with DCN
playing the role of shared memory for the (tiny) results only.

Because real multi-host hardware cannot be assumed, the per-host unit
(:func:`_run_host_window`) is also driven by :func:`simulate_multihost`,
which executes every host's window sequentially inside one process, each on
its own disjoint slice of the available devices, and asserts nothing about
process topology — the window math, per-host fetch, per-host mesh compute
and block assembly are exactly the code a real multi-process run executes.
"""

from __future__ import annotations

import functools as _functools

import numpy as np

from illico_tpu.utils.log import logger

__all__ = [
    "initialize_distributed",
    "host_gene_window",
    "window_handler",
    "asymptotic_wilcoxon_multihost",
    "simulate_multihost",
]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> tuple[int, int]:
    """Bring up ``jax.distributed`` for a multi-host run; single-host no-op.

    Returns ``(process_count, process_index)`` either way.  On TPU pods the
    arguments are normally auto-detected from the environment, so
    ``initialize_distributed()`` with no arguments is the common call; on
    CPU/GPU clusters pass coordinator/process arguments through.  Calling
    this twice, or in a plain single-process session, is safe.

    The no-arg form always ATTEMPTS ``jax.distributed.initialize()`` —
    jax's own cluster auto-detection covers GCE/GKE TPU slices and
    multislice, including cases (e.g. plain GCE pod slices) where nothing
    in ``os.environ`` announces the topology; an env-var sniff here would
    silently skip those and degrade every host to full-axis compute.  When
    auto-detection finds no cluster at all (a laptop, this dev host), jax
    raises ``ValueError: coordinator_address should be defined.`` and the
    call degrades to a single-process no-op.
    """
    import jax

    # ANY explicit argument (including a lone process_id or kwargs like
    # local_device_ids) signals cluster intent: swallowing jax's ValueError
    # for an incomplete config would silently degrade every host to
    # duplicated full-axis compute instead of surfacing the error.
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
        or bool(kwargs)
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    except ValueError:
        # No detectable cluster.  With explicit arguments that is a real
        # configuration error; bare calls mean single-process.
        if explicit:
            raise
    return jax.process_count(), jax.process_index()


def _window_base(n_genes: int, num_hosts: int, align: int = 128) -> int:
    """Common (aligned) per-host window width — the one source of truth
    shared by :func:`host_gene_window` and the all-gather padding."""
    base = -(-n_genes // num_hosts)  # ceil
    return -(-base // align) * align  # round up to alignment


def host_gene_window(
    n_genes: int, num_hosts: int, host_id: int, align: int = 128
) -> tuple[int, int]:
    """Contiguous gene window [lb, ub) owned by ``host_id``.

    Windows are balanced and ``align``-aligned (128 = the Mosaic lane-tile
    width every per-chip tile wants anyway), so per-host tile grids never
    straddle a host boundary.  Trailing hosts may receive empty windows when
    ``n_genes`` is small; they still participate in the final gather.
    """
    if not 0 <= host_id < num_hosts:
        raise ValueError(f"host_id {host_id} outside [0, {num_hosts}).")
    base = _window_base(n_genes, num_hosts, align)
    lb = min(host_id * base, n_genes)
    ub = min(lb + base, n_genes)
    return lb, ub


class ColumnWindowHandler:
    """Restriction of a :class:`DataHandler` to columns ``[lb, ub)``.

    The multi-host analog of the reference's per-chunk fetch
    (``registry.py:162-188``): every ``fetch_tile``/``fetch_columns`` the
    runner issues is offset into the host's window, so a backed dataset is
    only ever read inside the window.  Duck-types the DataHandler surface
    the runner consumes.
    """

    def __init__(self, base, lb: int, ub: int):
        n_genes = int(base.shape[1])
        if not 0 <= lb <= ub <= n_genes:
            raise ValueError(
                f"Window [{lb}, {ub}) outside the gene axis [0, {n_genes})."
            )
        self.base = base
        self.lb, self.ub = int(lb), int(ub)

    @property
    def data(self):
        # The handler convention exposes the raw matrix as ``.data`` — but
        # this handler's whole contract is column restriction, and the
        # base matrix is NOT window-offset.  Fail loudly rather than let a
        # future consumer silently read full-axis columns.
        raise AttributeError(
            "ColumnWindowHandler does not expose .data: the base matrix is "
            "not window-offset; use fetch_tile/fetch_columns."
        )

    @property
    def shape(self) -> tuple[int, int]:
        return (int(self.base.shape[0]), self.ub - self.lb)

    @property
    def dtype(self):
        return self.base.dtype

    @property
    def is_device(self) -> bool:
        # Device-resident bases use offset-free jitted slicing in the
        # runner; window_handler() slices those up front instead.
        return False

    def fetch_tile(self, lb: int, ub: int):
        return self.base.fetch_tile(self.lb + lb, self.lb + ub)

    def fetch_columns(self, idx):
        return self.base.fetch_columns(np.asarray(idx, dtype=np.int64) + self.lb)

    def footprint(self) -> int:
        n_genes = max(1, int(self.base.shape[1]))
        return int(self.base.footprint() * (self.ub - self.lb) / n_genes)

    def tile_footprint(self, width: int) -> int:
        return self.base.tile_footprint(width)

    def validate(self) -> None:
        self.base.validate()


def window_handler(base, lb: int, ub: int):
    """Window view of ``base``; device-resident data is sliced in HBM."""
    if getattr(base, "is_device", False):
        import jax

        from illico_tpu.utils.registry import data_handler_registry

        # Jitted with a traced start so every host window shares one
        # persistently-cacheable executable — an eager slice would build a
        # fresh executable per (process, window), minutes of cold-start
        # over a remote-compile link (same rationale as
        # ``models.wilcoxon._sampled_device_stats``).
        sliced = _jitted_window_slice(base.data, lb, ub - lb)
        return data_handler_registry.get(sliced)
    return ColumnWindowHandler(base, lb, ub)


@_functools.lru_cache(maxsize=1)
def _window_slice_fn():
    import functools

    import jax

    @functools.partial(jax.jit, static_argnames=("width",))
    def _slice(x, start, width: int):
        return jax.lax.dynamic_slice_in_dim(x, start, width, axis=1)

    return _slice


def _jitted_window_slice(data, start: int, width: int):
    return _window_slice_fn()(data, start, width)


def _run_host_window(
    handler,
    info,
    *,
    num_hosts: int,
    host_id: int,
    local_devices=None,
    is_log1p: bool,
    batch_size="auto",
    n_threads: int = 1,
    use_continuity: bool = True,
    tie_correct: bool = True,
    alternative: str = "two-sided",
    engine: str = "auto",
    precompile: bool = True,
    progress: bool = False,
    local_mesh: tuple[int, int] | None = None,
) -> tuple[int, int, np.ndarray]:
    """One host's unit of work: fetch + compute its gene window.

    ``local_mesh=(cell_devices, gene_devices)`` lays the host's chips out
    as a 2-D mesh (cell-axis sharding via additive histograms,
    :mod:`illico_tpu.parallel.cells`) instead of the default 1-D gene
    mesh — for datasets too tall for one chip's HBM, composed with the
    per-host gene windows.

    Returns ``(lb, ub, block)`` with ``block`` of shape
    ``(n_groups, ub - lb, 3)`` in [p, U, fc] layout.
    """
    from illico_tpu.models.wilcoxon import WilcoxonRunner

    n_genes = int(handler.shape[1])
    lb, ub = host_gene_window(n_genes, num_hosts, host_id)
    G = info.n_groups
    if ub == lb:
        return lb, ub, np.empty((G, 0, 3), np.float64)

    mesh = None
    if local_devices is None:
        import jax

        local_devices = jax.local_devices()
    if local_mesh is not None:
        from illico_tpu.parallel.cells import mesh_from_spec

        mesh = mesh_from_spec(local_mesh, devices=local_devices)
    elif len(local_devices) > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(local_devices), axis_names=("genes",))

    runner = WilcoxonRunner(
        window_handler(handler, lb, ub),
        info,
        is_log1p=is_log1p,
        batch_size=batch_size,
        n_threads=n_threads,
        use_continuity=use_continuity,
        tie_correct=tie_correct,
        alternative=alternative,
        engine=engine,
        mesh=mesh,
        device=(local_devices[0] if mesh is None else None),
    )
    if precompile:
        runner.precompile()
    res = runner.run(progress=progress)
    block = res.stacked
    if block is None:
        block = np.stack(
            [res.pvalues, res.statistics, res.fold_change], axis=-1
        )
    return lb, ub, np.ascontiguousarray(block)


def _assemble_blocks(blocks, n_groups: int, n_genes: int) -> np.ndarray:
    """Scatter per-host ``(lb, ub, block)`` windows into one full result.

    Windows must tile [0, n_genes) exactly — disjointness is checked per
    window, not just by summed width, so an overlapping-plus-gap
    misconfiguration cannot slip uninitialized memory into the results.
    """
    out = np.empty((n_groups, n_genes, 3), np.float64)
    prev_ub = 0
    for lb, ub, block in sorted(blocks, key=lambda b: b[0]):
        if lb != prev_ub or ub < lb:
            raise RuntimeError(
                f"Host windows do not tile the gene axis: window [{lb}, {ub}) "
                f"follows coverage up to {prev_ub} — inconsistent "
                "(n_genes, num_hosts) across hosts?"
            )
        out[:, lb:ub, :] = block[:, : ub - lb, :]
        prev_ub = ub
    if prev_ub != n_genes:
        raise RuntimeError(
            f"Host windows cover only [0, {prev_ub}) of {n_genes} genes — "
            "inconsistent (n_genes, num_hosts) across hosts?"
        )
    return out


def _allgather_blocks(
    lb: int, ub: int, block: np.ndarray, n_genes: int, num_hosts: int
) -> np.ndarray:
    """DCN gather of the per-host result blocks (the ONLY cross-host
    collective in the design).  Blocks are padded to the common window
    width so the all-gather is a single dense array op; every host returns
    the identical assembled ``(n_groups, n_genes, 3)``."""
    from jax.experimental import multihost_utils

    G = block.shape[0]
    base = _window_base(n_genes, num_hosts)
    padded = np.zeros((G, base, 3), np.float64)
    padded[:, : ub - lb, :] = block
    # The gather stages each host's block through ``jax.device_put``, which
    # CANONICALIZES float64 -> float32 whenever the global x64 flag is off —
    # and library policy is to never set that flag (the engines use local
    # x64 scopes only).  p/U/fc must survive bit-exactly, so gather the raw
    # 32-bit words instead: uint32 is canonicalization-stable and the view
    # round-trip is lossless.
    words = padded.view(np.uint32)  # (G, base, 6): f64 word pairs
    gathered = multihost_utils.process_allgather(words)  # (hosts, G, base, 6)
    gathered = np.ascontiguousarray(gathered).view(np.float64)  # (..., 3)
    blocks = []
    for h in range(num_hosts):
        hlb, hub = host_gene_window(n_genes, num_hosts, h)
        blocks.append((hlb, hub, gathered[h]))
    return _assemble_blocks(blocks, G, n_genes)


def asymptotic_wilcoxon_multihost(
    adata,
    is_log1p: bool,
    group_keys: str,
    reference: str | None = None,
    *,
    layer: str | None = None,
    **kwargs,
):
    """Multi-host entry point: same contract as ``asymptotic_wilcoxon``.

    Run the same program on every host of an initialized
    ``jax.distributed`` job (see :func:`initialize_distributed`).  Each
    host computes its own gene window on its local chips; the final
    DataFrame is identical on every host.  In a single-process session this
    degrades to the whole gene axis on the local devices.

    ``adata`` must expose the same genes on every host — for backed h5ad
    data, each host opens the (shared or replicated) file and reads only
    its window.

    ``local_mesh=(cell_devices, gene_devices)`` lays each host's chips
    out as a 2-D mesh (cell-axis sharding, histogram engine only) instead
    of the default 1-D gene mesh.
    """
    import jax

    from illico_tpu.api import build_result_frame
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import (
        data_handler_registry,
        ensure_backed_handlers,
    )

    ensure_backed_handlers()
    X = adata.layers[layer] if layer is not None else adata.X
    handler = data_handler_registry.get(X)
    handler.validate()
    raw_groups = np.asarray(adata.obs[group_keys])
    unique_groups, info = encode_and_count_groups(raw_groups, reference)

    num_hosts = jax.process_count()
    host_id = jax.process_index()
    n_genes = int(handler.shape[1])
    logger.trace(
        "Multi-host run: host %d/%d owns genes %s of %d.",
        host_id, num_hosts, host_gene_window(n_genes, num_hosts, host_id),
        n_genes,
    )
    lb, ub, block = _run_host_window(
        handler, info,
        num_hosts=num_hosts, host_id=host_id,
        is_log1p=is_log1p, **kwargs,
    )
    if num_hosts > 1:
        full = _allgather_blocks(lb, ub, block, n_genes, num_hosts)
    else:
        full = _assemble_blocks([(lb, ub, block)], info.n_groups, n_genes)
    return build_result_frame(unique_groups, adata.var_names, full.reshape(-1, 3))


def simulate_multihost(
    adata,
    is_log1p: bool,
    group_keys: str,
    reference: str | None = None,
    *,
    n_hosts: int,
    devices_per_host: int,
    layer: str | None = None,
    **kwargs,
):
    """Single-process simulation of the multi-host layout.

    Runs every host's window sequentially, each on its own disjoint
    ``devices_per_host``-device slice of ``jax.devices()`` (the virtual-CPU
    stand-in for one host's local chips), then assembles blocks exactly as
    the DCN gather would.  Everything except the process boundary — window
    math, per-host storage fetches, per-host ICI mesh, block assembly — is
    the real multi-host code path.
    """
    import jax

    from illico_tpu.api import build_result_frame
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import (
        data_handler_registry,
        ensure_backed_handlers,
    )

    ensure_backed_handlers()
    devices = jax.devices()
    if n_hosts * devices_per_host > len(devices):
        raise ValueError(
            f"Simulating {n_hosts} hosts x {devices_per_host} devices needs "
            f"{n_hosts * devices_per_host} devices; only {len(devices)} exist."
        )
    X = adata.layers[layer] if layer is not None else adata.X
    handler = data_handler_registry.get(X)
    handler.validate()
    raw_groups = np.asarray(adata.obs[group_keys])
    unique_groups, info = encode_and_count_groups(raw_groups, reference)

    blocks = []
    for h in range(n_hosts):
        local = devices[h * devices_per_host : (h + 1) * devices_per_host]
        blocks.append(
            _run_host_window(
                handler, info,
                num_hosts=n_hosts, host_id=h, local_devices=local,
                is_log1p=is_log1p, **kwargs,
            )
        )
    full = _assemble_blocks(blocks, info.n_groups, int(handler.shape[1]))
    return build_result_frame(unique_groups, adata.var_names, full.reshape(-1, 3))
