from guacamole_tpu.assembly.debruijn import DeBruijnGraph
