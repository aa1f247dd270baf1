from ilqr_tpu.ops.pallas.cilqr_kernel import cilqr_solve_pallas

__all__ = ["cilqr_solve_pallas"]
