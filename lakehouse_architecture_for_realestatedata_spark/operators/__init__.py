"""Relational + extension operators, each a tested composition of DataFrame ops."""
