"""Dependency-free HTML DOM + CSS selection used inside pandas UDFs."""

from wpextract_spark.htmlkit.dom import (
    CommentNode,
    Document,
    Node,
    Tag,
    TextNode,
    parse_html,
)
from wpextract_spark.htmlkit.select import select, select_one

__all__ = [
    "CommentNode",
    "Document",
    "Node",
    "Tag",
    "TextNode",
    "parse_html",
    "select",
    "select_one",
]
