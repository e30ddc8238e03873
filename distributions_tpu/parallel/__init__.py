"""Multi-chip/multi-host scaling: meshes, sharded sweeps, collectives."""
