from .database import RetrievalDatabase  # noqa: F401
from .head import RetrievalHeadSettings  # noqa: F401
from .asmk import ASMKSettings  # noqa: F401
