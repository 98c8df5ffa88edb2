"""Prompt tooling: Omost canvas composer, prompt refiner templates."""
