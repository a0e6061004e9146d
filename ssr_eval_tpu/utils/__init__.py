from ssr_eval_tpu.utils.common import (
    EPS,
    dict_mean,
    from_log,
    load_json,
    read_list,
    to_log,
    write_json,
    write_list,
)

__all__ = [
    "EPS",
    "dict_mean",
    "from_log",
    "load_json",
    "read_list",
    "to_log",
    "write_json",
    "write_list",
]
