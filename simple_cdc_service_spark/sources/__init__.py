from .tables import TABLES, load_table, load_tables  # noqa: F401
from .changelog import derive_changelog, generate_envelopes  # noqa: F401
