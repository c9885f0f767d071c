"""Human interfaces: the trajectory viewer."""
