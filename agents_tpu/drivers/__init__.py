from agents_tpu.drivers.jax_driver import DriverState, JaxDriver

__all__ = ["DriverState", "JaxDriver"]
