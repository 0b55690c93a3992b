from cheeta_mpc_tpu.viz.helpers import (LeggedVisualizer,  # noqa: F401
                                        center_of_pressure, support_polygon)
