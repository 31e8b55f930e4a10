"""Query registry: every operator exposed as (spark callable, oracle SQL).

This is the engine's public correctness surface. Each entry maps a name to
a Spark implementation ``(spark, sf_dir) -> DataFrame`` plus (where SQL-
expressible) an ANSI-SQL string DuckDB runs on the same parquet tables.
Column names are aliased identically on both sides — the driver's compare
sorts columns by name and hashes values.

Determinism rules used throughout:
- money aggregates go through DECIMAL (exact, associative) and are cast
  back to DOUBLE at the end — float sum order can't perturb the hash;
- every ratio/score is rounded; ranking windows always carry a unique
  tiebreaker column;
- timestamps stay in UTC (session timezone pinned in session.py).
"""

from ._core import *  # noqa: F401,F403,E402
from .streaming import *  # noqa: F401,F403,E402
from .multimodal import *  # noqa: F401,F403,E402
from .dedup import *  # noqa: F401,F403,E402
from .similarity import *  # noqa: F401,F403,E402
from .graph import *  # noqa: F401,F403,E402
from .text import *  # noqa: F401,F403,E402
from .corpus import *  # noqa: F401,F403,E402
from .windows import *  # noqa: F401,F403,E402
from .relational_p1 import *  # noqa: F401,F403,E402
from .relational_p2 import *  # noqa: F401,F403,E402
from .stats_p1 import *  # noqa: F401,F403,E402
from .stats_p2 import *  # noqa: F401,F403,E402
from .stats_p3 import *  # noqa: F401,F403,E402
from .stats_p4 import *  # noqa: F401,F403,E402
from .stats_p5 import *  # noqa: F401,F403,E402
from .composed import *  # noqa: F401,F403,E402
from .lakehouse import *  # noqa: F401,F403,E402
