"""End-to-end logical plans composed from the operators."""
