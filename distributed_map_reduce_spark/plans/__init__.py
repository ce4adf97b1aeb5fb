from .mapreduce import exec_mr, exec_mr_df, local_exec_mr
from .kv import KVTable

__all__ = ["exec_mr", "exec_mr_df", "local_exec_mr", "KVTable"]
