"""kmpc_tpu — TPU-native Koopman-MPC portfolio rebalancing framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
reference research codebase ``yli421/koopman-mpc-portfolio-rebalancing``:
Koopman autoencoder learning of linear latent dynamics, convex horizon-H
MPC (log-wealth / Kelly objective with budget, no-short, and turnover
constraints), backtesting with Buy&Hold / Markowitz / DMD baselines, and
the multi-mode rollout evaluation protocol — all redesigned TPU-first
(batched first-order MPC solves, lax.scan rollouts, mesh-sharded
backtests) rather than ported.
"""

__version__ = "0.1.0"

from kmpc_tpu.config import Config, get_config

__all__ = ["Config", "get_config", "__version__"]
