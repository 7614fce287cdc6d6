from guacamole_tpu.pack.events import EventKind, read_pileup_events
from guacamole_tpu.pack.tiles import LocusTile, pack_tile, pack_tiles
