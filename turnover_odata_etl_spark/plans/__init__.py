"""Query-plan inventory.

Importing this package populates :mod:`.registry` with every declared
query. ``__spark_entry__.py`` exposes the registry to the driver.
"""

from . import registry  # noqa: F401

# Import order = inventory order; each module registers its queries at
# import time.
from . import reference  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import streaming_plans  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
