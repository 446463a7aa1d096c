from .admm import ADMMState, SolveStats, admm_solve
