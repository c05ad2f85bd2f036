"""crn_meta_validate_ray — a Ray-Data-native schema + constraint validation engine.

Built from scratch (not a port) with the validation capabilities of the
reference validator (ASAP-CRN/crn-meta-validate): a declarative CDE-style
constraint registry compiled into vectorized Arrow-compute predicates
evaluated via ``ray.data.Dataset.map_batches`` over zero-copy batches,
stateful actor-pool sketch stages (HyperLogLog / count-min / t-digest),
and hash-partitioned group checks (uniqueness, sequence contiguity,
referential integrity) with skew-aware salting.

Reference semantics are documented per-module with ``file:line`` citations
into ``/root/reference`` so parity can be audited; no reference code is
copied.
"""

from crn_meta_validate_ray.registry import (  # noqa: F401
    FieldRule,
    RefRule,
    SeqRule,
    UniqueRule,
    DriftRule,
    NullRateRule,
    TableRules,
    ConstraintSet,
)
from crn_meta_validate_ray.report import ReportCollector  # noqa: F401
from crn_meta_validate_ray.pipelines.validate_pipeline import (  # noqa: F401
    validate_dataset,
    ValidationRun,
)

__version__ = "0.1.0"
