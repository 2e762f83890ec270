from .session import get_spark, load_table  # noqa: F401
from .contracts import validate, ContractViolation  # noqa: F401
