from .session import get_spark  # noqa: F401
from .contracts import validate, ContractViolation  # noqa: F401
