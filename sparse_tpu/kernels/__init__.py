"""XLA/Pallas compute kernels — the TPU-native replacement for the
reference's Numba layer. Pure, jittable functions over plain arrays."""

from . import bsr, dot, ell, segment, spgemm  # noqa: F401
from .bsr import (  # noqa: F401
    BSR,
    bsr_sddmm_pallas,
    bsr_spmm,
    bsr_spmm_pallas,
    bsr_spmm_trainable,
    bsr_spmm_xla,
    build_bsr,
    transpose_bsr_layout,
)
from .spgemm import esc_spgemm, product_count  # noqa: F401
from .dot import coo_spmm, coo_spmv, dense_coo_matmul, mttkrp, sddmm, uncompress_indptr  # noqa: F401
from .dia import DiaMatrix, build_dia, dia_spmm, dia_spmv, dia_spmv_sharded  # noqa: F401
from .ell import BlockEll, build_block_ell, build_block_ell_3d, ell_mttkrp, ell_spmm, ell_spmv  # noqa: F401
from .row_ell import RowEll, build_row_ell, row_ell_spmm, row_ell_spmm_program, row_ell_spmv  # noqa: F401
from .segment import segment_reduce, segment_sum_onehot_mm  # noqa: F401
