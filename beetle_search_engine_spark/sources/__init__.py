from .session import get_spark  # noqa: F401
from .corpus import (  # noqa: F401
    generate_corpus,
    load_documents,
    load_embeddings,
    documents_as_corpus,
)
