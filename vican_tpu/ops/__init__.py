"""Device-side compute kernels (jax.numpy / Pallas)."""
