"""URN templating as Column expressions (SURVEY.md F1).

URN formats follow the public DataHub URN conventions the reference
relies on (make_term_urn / make_dataset_urn usage at
/root/reference/dbt_metrics_to_datahub.py:49-51,233-237,267):
  glossary node:  urn:li:glossaryNode:<name>
  glossary term:  urn:li:glossaryTerm:<name>
  dataset:        urn:li:dataset:(urn:li:dataPlatform:<platform>,<name>,<env>)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def glossary_node_urn(name: Column | str) -> Column:
    return F.concat(F.lit("urn:li:glossaryNode:"), _c(name))


def glossary_term_urn(name: Column | str) -> Column:
    return F.concat(F.lit("urn:li:glossaryTerm:"), _c(name))


def dataset_urn(name: Column | str, platform: str = "dbt", env: str = "PROD") -> Column:
    return F.concat(
        F.lit(f"urn:li:dataset:(urn:li:dataPlatform:{platform},"),
        _c(name),
        F.lit(f",{env})"),
    )
