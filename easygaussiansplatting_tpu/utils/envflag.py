"""Boolean env-flag parsing for the EGS_* perf knobs.

`bool(os.environ.get(...))` treats "0" and "false" as ON — dangerous for
flags that change numerics/codegen (an operator exporting EGS_FUSED_PRE=0 to
force the baseline would silently get the variant). Central helper so every
flag agrees that "", "0", "false", "no", "off" mean off.
"""

import os

_FALSY = {"", "0", "false", "no", "off"}


def env_flag(name: str) -> bool:
    return os.environ.get(name, "").strip().lower() not in _FALSY
