"""Guard: the suite must run on the virtual CPU mesh, never the TPU
plugin (a round-1 conftest bug ran every test over the TPU tunnel)."""
import jax


def test_backend_is_cpu_mesh():
    assert jax.default_backend() == 'cpu', jax.default_backend()
    assert len(jax.devices()) == 8
