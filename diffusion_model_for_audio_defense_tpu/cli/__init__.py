
# every driver benefits from the persistent compile cache (attack graphs
# cost minutes to compile once, ~seconds from cache on reruns)
from ..core.functional import enable_compilation_cache as _ecc

_ecc()
del _ecc
