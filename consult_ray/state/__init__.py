"""Stateful components: driver union-find, band-table lookup actors."""
