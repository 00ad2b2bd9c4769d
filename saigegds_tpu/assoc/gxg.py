"""GxG SNP-pair interaction tests with SPA. (in progress)"""


def gxg_spa(*a, **k):
    raise NotImplementedError("implemented in a later milestone this round")
