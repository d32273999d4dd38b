from agents_tpu.drivers.jax_driver import (DriverState, JaxDriver,
                                           JaxEpisodeDriver)

__all__ = ["DriverState", "JaxDriver", "JaxEpisodeDriver"]
