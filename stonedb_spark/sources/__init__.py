"""Sources/sinks/DDL surface (SURVEY.md §2.1).

Re-exports the user-facing view DDL so `from stonedb_spark.sources
import create_view` works like the reference's SQL-layer CREATE VIEW
(mysql-test/suite/tianmu/t/create_view.test).
"""

from stonedb_spark.sources.views import (  # noqa: F401
    NotATableError,
    NotAViewError,
    ViewError,
    ViewExistsError,
    create_view,
    drop_table_guard,
    drop_view,
    list_views,
    refresh_views,
    view_definition,
)
