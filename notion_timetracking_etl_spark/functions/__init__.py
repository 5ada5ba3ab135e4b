from . import datetimes, extract, strings  # noqa: F401
