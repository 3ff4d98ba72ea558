from . import metrics
from . import monte_carlo
from . import timing_analysis
from .metrics import collision_rate, expectation_of_shortfall, safety_metrics
from .monte_carlo import (MonteCarloResult, print_mc_summary,
                          run_monte_carlo_simulation)
from .timing_analysis import analyze_dr_cvar_computation_time
