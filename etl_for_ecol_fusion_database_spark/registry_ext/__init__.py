"""Extension-operator registry (SURVEY.md §2.11 / north-star X1-X13):
dedup, similarity search, text analysis, multimodal columns, event
windows, sampling, history, sketches, quality, skew — split into block
modules in round 6 (the single module had grown past 6,900 lines).

Same conventions as registry.py.  Queries without an oracle entry
(xxhash64-based LSH/SimHash, mapInPandas decode) get the driver's
rows-only check; every one of those still has a property-based pytest
(tests/test_ext_operators.py) asserting semantic invariants against an
exact ground truth.

IMPORT ORDER IS LOAD-BEARING: @query registration order feeds the
__spark_entry__ witness rotation and docs/OPERATORS.md ordering.  The
block modules below are imported in the original file's block order —
append new blocks at the end, never reorder.
"""

from __future__ import annotations

from ._shared import _t, _with_synthetic_near_dups  # noqa: F401  (test surface)
from . import q01_dedup  # noqa: E402,F401
from . import q02_similarity  # noqa: E402,F401
from . import q03_text  # noqa: E402,F401
from . import q04_multimodal  # noqa: E402,F401
from . import q05_windows  # noqa: E402,F401
from . import q06_text_quality  # noqa: E402,F401
from . import q07_sampling  # noqa: E402,F401
from . import q08_history  # noqa: E402,F401
from . import q09_r2_curation  # noqa: E402,F401
from . import q10_olap_breadth  # noqa: E402,F401
from . import q11_r2_late  # noqa: E402,F401
from . import q12_r3_showcase  # noqa: E402,F401
from . import q13_r4_quality  # noqa: E402,F401
from . import q14_r4b_scale  # noqa: E402,F401
from . import q15_r13  # noqa: E402,F401
