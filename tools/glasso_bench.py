"""Accelerator graphical-lasso probe at the reference's GOE sparse scale.

The reference's largest sparse preparation is the 1007-taxon GOE analysis
(2,047 branch dims).  The host BCD solver is O(p) cyclic Python lasso
solves per sweep — practical to a few hundred dims; this probe times the
TPU ADMM solver (utils/glasso.py:graphical_lasso_admm) on a synthetic
correlation matrix of GOE shape and verifies the solution KKT conditions.

Usage: python tools/glasso_bench.py [p] [rho]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mcmcdate_tpu.utils import glasso as G

p = int(sys.argv[1]) if len(sys.argv) > 1 else 2047
rho = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1

rng = np.random.default_rng(0)
# Synthetic sparse-precision truth: banded + noise, standardized to a
# correlation-like S (the prepare pipeline feeds the correlation matrix).
n_samp = 3000
A = np.eye(p) * 2.0
idx = np.arange(p - 1)
A[idx, idx + 1] = A[idx + 1, idx] = -0.6
cov = np.linalg.inv(A)
d = np.sqrt(np.diag(cov))
S = cov / np.outer(d, d)
# Sample noise so S is an empirical correlation (well-conditioned).
X = rng.multivariate_normal(np.zeros(p), S, size=n_samp, method="cholesky")
mu, sd, xn = G.scale_data(X)
S_emp = np.cov(xn, rowvar=False)

t0 = time.perf_counter()
W, Theta = G.graphical_lasso_admm(S_emp, rho, tol=1e-7)
t1 = time.perf_counter()

# KKT check: for Theta_ij != 0, |(Theta^-1 - S)_ij| ~ rho*sign; for
# Theta_ij == 0, |(Theta^-1 - S)_ij| <= rho (+ solver tolerance).
R = W - S_emp
nz = Theta != 0
viol_nz = np.max(np.abs(R[nz] - rho * np.sign(Theta[nz])))
viol_z = max(0.0, np.max(np.abs(R[~nz])) - rho) if (~nz).any() else 0.0
kept = nz.mean()

print(f"p={p} rho={rho}: {t1 - t0:.1f} s on the accelerator")
print(f"kept {kept:.3%} of precision entries; KKT viol nz={viol_nz:.2e} "
      f"z={viol_z:.2e}")
sign, ld = np.linalg.slogdet(W)
print(f"slogdet(W): sign={sign} logdet={ld:.3f}")
