"""mcmcdate_tpu — a TPU-native Bayesian phylogenetic dating engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dschrempf/mcmc-date: posterior node-age inference on a fixed rooted topology
with a multivariate-normal approximation of the phylogenetic likelihood,
birth-death tree prior, relaxed molecular clocks, node calibrations / order
constraints / braces, Metropolis-within-Gibbs proposal cycles, HMC/NUTS,
MC3 parallel tempering, and stepping-stone marginal likelihoods — vmapped
over thousands of parallel chains and sharded over TPU meshes.
"""

__version__ = "0.1.0"
