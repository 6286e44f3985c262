from .flagship import flagship_join, flagship_tiles, run_flagship_partitioned

__all__ = ["flagship_join", "flagship_tiles", "run_flagship_partitioned"]
