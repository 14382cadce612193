"""Import all built-in plugins so their registry decorators run."""

from . import codecs  # noqa: F401
from . import datasets  # noqa: F401
from . import evaluators  # noqa: F401
from . import pipelines  # noqa: F401
from .models import wrappers  # noqa: F401
