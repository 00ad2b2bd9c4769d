from .gds import open_gds, GDSFile, GDSNode
from .rds import read_rds, read_rdata, RObject, strip
