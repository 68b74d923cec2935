from hcrag_tpu.query.engine import QueryBatchResult, QueryEngine  # noqa: F401
from hcrag_tpu.query.executor import BatchedExecutor  # noqa: F401
from hcrag_tpu.query.graph_query import (  # noqa: F401
    GraphQuery,
    answer_graph_question,
    execute_graph_query,
    generate_graph_query,
)
