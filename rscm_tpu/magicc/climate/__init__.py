"""MAGICC climate (temperature response) components."""
