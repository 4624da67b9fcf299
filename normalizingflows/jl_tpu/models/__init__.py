"""Flow zoo: bijector protocol, distributions, coupling/spline/planar/radial/
Hamiltonian layers, conditioner nets, and synthetic targets."""
