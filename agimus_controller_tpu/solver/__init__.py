"""OCP solvers: FDDP (Crocoddyl `SolverFDDP` equivalent) and constrained
CSQP (mim_solvers `SolverCSQP` equivalent), written as jitted fixed-iteration
`lax.scan` Riccati recursions with masked early exit (SURVEY.md §2b N4)."""

from .csqp import CSQPSettings, CSQPSolution, solve_csqp
from .fddp import SolverSettings, Solution, solve_fddp
