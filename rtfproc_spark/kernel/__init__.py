"""Pure-Python RTF kernel (no Spark imports here — usable on executors)."""

from .engine import (  # noqa: F401
    RAW_BUFFER_SIZE,
    TXT_BUFFER_SIZE,
    ReplacementSet,
    RTFEngine,
    empty_replacements,
    rtf_replace_bytes,
)
from .unicode import (  # noqa: F401
    cdpt_from_utf8,
    cdpt_from_utf16,
    utf8_from_cdpt,
    utf16_from_cdpt,
)
from .codepage import DBSQ, NONE, UNSP, cpgfromcharsetnum, cpgtou  # noqa: F401
from .api import rtf_extract, rtf_replace, rtf_strip  # noqa: F401
