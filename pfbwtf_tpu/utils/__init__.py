from .tables import NTOA_TABLE, NT4_TABLE
from .errors import PfbwtError, die
from .timer import task_timer

__all__ = ["NTOA_TABLE", "NT4_TABLE", "PfbwtError", "die", "task_timer"]
