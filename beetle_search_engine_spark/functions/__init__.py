from .porter import stem  # noqa: F401
from .analyzer import STOP_WORDS, analyze, analyze_query  # noqa: F401
