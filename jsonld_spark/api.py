"""API entry points over UNRESOLVED inputs (URL / file-like / parsed).

The reference's ``JSON::LD::API.{expand,compact,flatten,frame,toRdf}``
all funnel through ``API#initialize`` (api.rb:117-160), which resolves a
string input through the documentLoader, takes the RemoteDocument's
``documentUrl`` as the base and its Link-header ``contextUrl`` as the
default active context.  ``load_api_input`` (context.py) implements that
resolution against the offline broadcast cache; these wrappers apply it
to each document-level operation.  ``expand_input`` lives in expand.py
(no circular import); it is re-exported here for one import site.
"""

from __future__ import annotations

from .compact import compact_document
from .context import load_api_input
from .expand import expand_document, expand_input
from .flatten import flatten_document
from .frame import frame_document
from .to_rdf import doc_to_quads

__all__ = [
    "expand_input",
    "compact_input",
    "flatten_input",
    "frame_input",
    "to_rdf_input",
]


def compact_input(input_, context, base=None, cache=None, validate=False, **kw):
    """API.compact over an unresolved input (api.rb:235-264): resolve,
    expand (under the input's own/linked context), then compact with the
    PROVIDED context."""
    doc, doc_base, context_ref = load_api_input(
        input_, cache=cache, base=base, validate=validate
    )
    expanded = expand_document(doc, context=context_ref, base=doc_base, cache=cache)
    return compact_document(expanded, context, base=doc_base, cache=cache, **kw)


def flatten_input(input_, context=None, base=None, cache=None, validate=False, **kw):
    """API.flatten over an unresolved input (api.rb:290-351)."""
    doc, doc_base, context_ref = load_api_input(
        input_, cache=cache, base=base, validate=validate
    )
    if context_ref is not None and "expand_context" not in kw:
        # initialize folds the Link-header context into the active
        # context before expansion (api.rb:156)
        kw = dict(kw, expand_context=context_ref)
    return flatten_document(doc, context=context, base=doc_base, cache=cache, **kw)


def frame_input(input_, frame, base=None, cache=None, validate=False, **kw):
    """API.frame over an unresolved input (api.rb:382-509); the frame
    itself may also be a URL / file-like."""
    doc, doc_base, context_ref = load_api_input(
        input_, cache=cache, base=base, validate=validate
    )
    frame_doc, _, _ = load_api_input(frame, cache=cache, base=base, validate=validate)
    if context_ref is not None and "expand_context" not in kw:
        kw = dict(kw, expand_context=context_ref)
    return frame_document(doc, frame_doc, base=doc_base, cache=cache, **kw)


def to_rdf_input(input_, base=None, cache=None, validate=False, **kw):
    """API.toRdf over an unresolved input (api.rb:526-563) → list[Quad]."""
    doc, doc_base, context_ref = load_api_input(
        input_, cache=cache, base=base, validate=validate
    )
    if context_ref is not None and "expand_context" not in kw:
        kw = dict(kw, expand_context=context_ref)
    return doc_to_quads(doc, base=doc_base, cache=cache, **kw)
