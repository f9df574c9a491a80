"""End-to-end pipeline recipes composed from the engine's operators."""
