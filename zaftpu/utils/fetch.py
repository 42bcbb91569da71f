"""Tunnel-safe device->host fetches.

Remote-device deployments (the axon TPU tunnel this framework is developed
against) cannot transfer complex arrays in either direction — the transfer
fails with UNIMPLEMENTED and one failed fetch poisons every later fetch in
the process (docs/tpu_results/diag.json; the artifact twice masqueraded as
Mosaic/sharding compile failures in round 3). :func:`asnumpy` is the public
fetch helper: complex device arrays come back as two real plane transfers
recombined on host; everything else is a plain ``np.asarray``.
"""

from __future__ import annotations

import numpy as np


def asnumpy(x) -> np.ndarray:
    """Fetch ``x`` to a NumPy array, transferring complex device arrays as
    (real, imag) plane pairs — safe through remote-device tunnels where
    complex transfers are unimplemented. Host arrays and real device
    arrays pass straight through ``np.asarray``."""
    import jax
    import jax.numpy as jnp

    if (isinstance(x, jax.Array)
            and jnp.issubdtype(x.dtype, jnp.complexfloating)):
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        out = np.empty(re.shape, np.complex64 if x.dtype == jnp.complex64
                       else np.complex128)
        out.real = re
        out.imag = im
        return out
    return np.asarray(x)
