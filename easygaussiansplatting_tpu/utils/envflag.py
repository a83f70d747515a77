"""Boolean env-flag parsing for the EGS_* perf knobs.

`bool(os.environ.get(...))` treats "0" and "false" as ON — dangerous for
flags that change numerics/codegen (an operator exporting EGS_FUSED_PRE=0 to
force the baseline would silently get the variant). Central helper so every
flag agrees that "", "0", "false", "no", "off" mean off.
"""

import os

_FALSY = {"", "0", "false", "no", "off"}


def env_flag(name: str, default: bool = False) -> bool:
    """`default` applies when the variable is UNSET; an explicit empty/falsy
    value always means off (so default-on flags keep an off switch)."""
    if name not in os.environ:
        return default
    return os.environ[name].strip().lower() not in _FALSY
