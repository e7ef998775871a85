from .query_plan import (  # noqa: F401
    Bool,
    Exists,
    Fuzzy,
    Ids,
    MatchAll,
    MatchNone,
    Phrase,
    Range,
    Regexp,
    SpanFirst,
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    Term,
    Wildcard,
    WildcardPhrase,
)
from .compiler import compile_query  # noqa: F401
from .limiting import limiting_filter  # noqa: F401
