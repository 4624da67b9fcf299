"""Compute ops: partition masks, rational-quadratic splines (jnp oracle +
Pallas kernels), and batched monotone root-finding."""
