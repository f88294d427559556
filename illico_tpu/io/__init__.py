from illico_tpu.io.h5ad import AnnDataLite, read_h5ad, write_h5ad

__all__ = ["AnnDataLite", "read_h5ad", "write_h5ad"]
