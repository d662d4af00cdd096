"""Machine signature for ISA-specialized build/cache artifacts.

Two artifact classes are specialized to the building machine's vector
ISA and can SIGILL (not error) when loaded elsewhere: XLA:CPU's AOT
compile cache and the -march=native native runtime .so.  Both key their
on-disk names by this signature so a foreign artifact is simply not
found rather than fatally loaded.
"""

from __future__ import annotations

import functools
import hashlib
import platform


@functools.lru_cache(maxsize=1)
def machine_signature() -> str:
    """12-hex digest of the CPU architecture + feature flags."""
    src = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    src += line
                    break
    except OSError:
        pass
    return hashlib.sha1(src.encode()).hexdigest()[:12]
