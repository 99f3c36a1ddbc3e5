FROM rabbitmq:4-management
COPY deploy/rabbitmq.advanced.config /etc/rabbitmq/advanced.config
