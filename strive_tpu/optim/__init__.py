from .loop import run_adam_loop  # noqa: F401
from .init_optim import run_init_optim  # noqa: F401
from .adv import run_adv_gen_optim, compute_adv_gen_success  # noqa: F401
from .sol import run_find_solution_optim, compute_sol_success  # noqa: F401
from .refine import run_refine_optim  # noqa: F401
from .feasibility import (determine_feasibility,  # noqa: F401
                          restrict_attackers_to_category)  # noqa: F401
