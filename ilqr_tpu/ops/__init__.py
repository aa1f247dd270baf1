from ilqr_tpu.ops import constraints, cost, projection, riccati, dare

__all__ = ["constraints", "cost", "projection", "riccati", "dare"]
