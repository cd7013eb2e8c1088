"""lammps_plugins_tpu — a TPU-native molecular dynamics framework in JAX.

Re-implements, from scratch and TPU-first, the physics of the
``lammps/lammps-plugins`` reference set (AEAM angular EAM, REBOMOS bond-order
MoS2 potential, fix bfield Lorentz integrator) together with the LAMMPS engine
substrate those plugins rely on: neighbor lists, triclinic periodic boxes,
velocity-Verlet with ordered fix hooks, thermo output, potential-file parsers,
and spatial sharding across TPU meshes.

Design (TPU-first, not a port):
  * All per-step compute is pure-functional JAX over fixed-shape padded
    tensors; the hot loops compile to fused XLA/Pallas kernels.
  * Potential energies are written once as differentiable functions;
    forces are exact autodiff gradients (the reference's hand-written force
    distributions are the analytic gradients of its energies), and the virial
    is the strain derivative of the same function.
  * Periodic images ("ghost atoms") are constructed *inside* the energy
    function from owned positions, so image reaction forces fall out of the
    chain rule with no reverse communication.
  * Multi-chip scaling uses jax.sharding / shard_map spatial decomposition
    with ICI collectives instead of MPI ghost exchange.

Package layout:
  core/        State pytree, units, triclinic Box/PBC, lattice, regions
  neighbor/    ghost/image expansion + padded [N, K] neighbor lists
  potentials/  pair styles (rebomos, aeam), table parsers, spline machinery
  fixes/       nve, nvt (Nose-Hoover), bfield, velocity create
  run/         fused step function, thermo, simulation driver
  parallel/    mesh spatial decomposition + halo exchange
  ops/         Pallas TPU kernels for the hot paths
  api/         LAMMPS-shaped scene builder + input-script interpreter
"""

__version__ = "0.1.0"
