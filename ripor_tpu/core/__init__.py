from ripor_tpu.core.mesh import MeshSpec, create_mesh, local_mesh
from ripor_tpu.core.precision import Policy, DEFAULT_POLICY

__all__ = ["MeshSpec", "create_mesh", "local_mesh", "Policy", "DEFAULT_POLICY"]
