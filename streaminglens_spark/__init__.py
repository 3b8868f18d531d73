"""PySpark-native analytics engine with the capabilities of
qubole/streaminglens (see SURVEY.md)."""

from .api import StreamingLens
from .config import StreamingLensConfig

__all__ = ["StreamingLens", "StreamingLensConfig"]
__version__ = "0.1.0"
