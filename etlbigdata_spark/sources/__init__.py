from . import readers, writers
