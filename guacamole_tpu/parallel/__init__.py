from guacamole_tpu.parallel.mesh import (
    loci_mesh,
    sharded_call_step,
    stack_tiles,
)
