from . import host_solver
