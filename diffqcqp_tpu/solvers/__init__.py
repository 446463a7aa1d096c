from .admm import ADMMState, SolveStats, admm_solve, make_admm_step
