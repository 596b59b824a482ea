"""jsonld_spark — PySpark-native JSON-LD 1.1 knowledge-graph construction.

A brand-new engine (NOT a port) with the capabilities of the Ruby
json-ld gem (/root/reference): context resolution, expansion,
flattening, toRdf triple emission, fromRdf, compaction, framing —
re-expressed Spark-first:

- pure-Python JSON-LD 1.1 algorithm core (this package's
  ``context``/``expand``/``flatten``/``to_rdf``/... modules), executed
  per-document inside Arrow-batched pandas UDFs;
- a relational triples core ``(subj, pred, obj, obj_is_literal,
  obj_datatype, obj_lang, graph)`` processed with DataFrame operators
  (salted shuffles, broadcast joins, connected components);
- an offline broadcast remote-context cache (executors never touch the
  network).
"""

from .context import Context, ContextCache, canon_context_url, load_api_input
from .errors import JsonLdError
from .api import compact_input, flatten_input, frame_input, to_rdf_input
from .expand import expand_document, expand_input
from .flatten import flatten_document, flatten_expanded
from .rdf_model import Quad, parse_nquads, quad_to_nquads, quads_to_nquads
from .to_rdf import doc_to_quads, expanded_to_quads

__version__ = "0.1.0"

__all__ = [
    "Context",
    "ContextCache",
    "JsonLdError",
    "Quad",
    "canon_context_url",
    "doc_to_quads",
    "compact_input",
    "expand_document",
    "expand_input",
    "flatten_input",
    "frame_input",
    "to_rdf_input",
    "load_api_input",
    "expanded_to_quads",
    "flatten_document",
    "flatten_expanded",
    "parse_nquads",
    "quad_to_nquads",
    "quads_to_nquads",
]
