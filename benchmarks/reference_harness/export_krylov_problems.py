"""Export the suite's Krylov-gallery matrices to npz for ref_krylov.py."""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from pyamg_tpu.gallery import (poisson, stencil_grid, diffusion_stencil_2d,
                               linear_elasticity, load_example)

probs = {}
probs["poisson2d_64"] = poisson((64, 64), format="csr")
probs["poisson3d_16"] = poisson((16, 16, 16), format="csr")
probs["aniso_64"] = stencil_grid(
    diffusion_stencil_2d(epsilon=0.01, theta=np.pi / 4, type="FD"),
    (64, 64), format="csr")
A, _B = linear_elasticity((24, 24))
probs["elasticity_24"] = A.tocsr()
probs["recirc_flow"] = load_example("recirc_flow")["A"].tocsr()

arrs = {}
for name, A in probs.items():
    A = A.tocsr()
    A.sort_indices()
    arrs[f"{name}_data"] = A.data
    arrs[f"{name}_indices"] = A.indices
    arrs[f"{name}_indptr"] = A.indptr
    arrs[f"{name}_shape"] = np.array(A.shape)
np.savez("/tmp/krylov_gallery_problems.npz", **arrs)
print("exported", sorted(probs))
