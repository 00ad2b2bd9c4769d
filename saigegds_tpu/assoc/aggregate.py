"""Aggregate (gene/region) tests: burden, ACAT-V, ACAT-O. (in progress)"""


def assoc_burden(*a, **k):
    raise NotImplementedError("implemented in a later milestone this round")


def assoc_acat_v(*a, **k):
    raise NotImplementedError("implemented in a later milestone this round")


def assoc_acat_o(*a, **k):
    raise NotImplementedError("implemented in a later milestone this round")
