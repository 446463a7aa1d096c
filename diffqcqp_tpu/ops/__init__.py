from .linalg import Factorization, factorize, linf_norm, power_iteration, refine_solve, solve_shifted
from .prox import prox_box, prox_disk, prox_nonneg, prox_signed_box
