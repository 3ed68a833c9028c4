from .strings import coalesce_nonempty, csv_join
from .urns import (
    dataset_urn,
    glossary_node_urn,
    glossary_term_urn,
)

__all__ = [
    "coalesce_nonempty",
    "csv_join",
    "dataset_urn",
    "glossary_node_urn",
    "glossary_term_urn",
]
